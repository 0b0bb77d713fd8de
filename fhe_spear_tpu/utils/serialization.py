"""Checkpoint / resume: keys, pre-encoded diagonal blocks, ciphertexts,
and generation state (an aux subsystem the reference lacks — SURVEY.md §5
"Checkpoint / resume: none" — added here for production use).

Format: numpy .npz (no pickle for array payloads), one file per object.
Secret keys are stored separately from evaluation keys so a server-side
checkpoint never contains decryption capability.
"""

from __future__ import annotations

import numpy as np

__all__ = ["save_ciphertext", "load_ciphertext", "save_secret_key",
           "load_secret_key", "load_secret_key_into",
           "save_eval_keys", "load_eval_keys",
           "save_generation_state", "load_generation_state"]


def save_ciphertext(path: str, ct, ctx=None) -> None:
    """ct arrays are EVAL-domain: their bin order depends on the context's
    NTT backend (stockham bitrev vs mxu natural), so the order is tagged
    and checked on load."""
    order = getattr(getattr(ctx, "ntt", None), "order", "stockham")
    np.savez_compressed(path, c=np.asarray(ct.c), scale=ct.scale,
                        order=np.bytes_(order.encode()))


def load_ciphertext(path: str, ctx=None):
    import jax.numpy as jnp

    from ..ckks.ciphertext import Ciphertext

    z = np.load(path)
    saved = bytes(z["order"]).decode() if "order" in z else "stockham"
    if ctx is not None:
        cur = getattr(ctx.ntt, "order", "stockham")
        assert saved == cur, (
            f"ciphertext was serialized from a {saved!r}-order context; "
            f"this context's NTT backend is {cur!r} — eval-domain bin "
            "orders differ, the payload is not portable")
    return Ciphertext(jnp.asarray(z["c"]), float(z["scale"]))


def save_secret_key(path: str, ctx) -> None:
    np.savez_compressed(path, sk=ctx._sk_coeff, n=ctx.n, seed_note=0)


def load_secret_key(path: str, params):
    """Restore a secret key into a FRESH context (preferred API): the
    relinearization key is generated from the restored secret and no stale
    compiled kernel can reference old key material."""
    from ..ckks.context import CkksContext

    z = np.load(path)
    ctx = CkksContext(params, sk_coeff=z["sk"])
    assert int(z["n"]) == ctx.n
    return ctx


def load_secret_key_into(path: str, ctx) -> None:
    """Restore a secret key into an existing context built with the same
    params.  Delegates to CkksContext.set_secret_key, which drops every
    cached jitted kernel holding old key material and regenerates the
    relinearization key; galois keys are cleared (re-run ensure_galois)."""
    z = np.load(path)
    assert int(z["n"]) == ctx.n
    ctx.set_secret_key(z["sk"])


def save_eval_keys(path: str, ctx) -> None:
    """Persist the server's evaluation-key material: the relinearization
    key, every generated Galois rotation key, and (if built) the identity
    keyswitch key.  Deliberately EXCLUDES the secret key — this is the
    bundle a restarting evaluation server loads; it confers no decryption
    capability (the sk-separation discipline of save_secret_key).

    The reference has no counterpart (its keys live in GPU memory for the
    process lifetime, SURVEY.md §5 "Checkpoint/resume: none"); this
    framework's client/server transport (70.8 MB/token wire accounting)
    needs the server side restartable.

    Format: uncompressed .npz — keyswitch keys are uniform-random residue
    tensors, incompressible; savez_compressed would burn minutes of CPU
    for ~0% gain at production sizes (~6 GB of keys at N=16384/L=59)."""
    arrs = {
        "relin_b": np.asarray(ctx.relin_key.b),
        "relin_a": np.asarray(ctx.relin_key.a),
        "galois_elts": np.asarray(sorted(ctx.galois_keys), dtype=np.int64),
        "n": np.int64(ctx.n), "L": np.int64(ctx.L), "K": np.int64(ctx.K),
        "dnum": np.int64(ctx.dnum),
        "order": np.bytes_(getattr(ctx.ntt, "order", "stockham").encode()),
    }
    for g in sorted(ctx.galois_keys):
        k = ctx.galois_keys[g]
        arrs[f"gk{g}_b"] = np.asarray(k.b)
        arrs[f"gk{g}_a"] = np.asarray(k.a)
    if hasattr(ctx, "_identity_ksk"):
        arrs["id_b"] = np.asarray(ctx._identity_ksk.b)
        arrs["id_a"] = np.asarray(ctx._identity_ksk.a)
    np.savez(path, **arrs)


def load_eval_keys(path: str, ctx) -> None:
    """Install a saved evaluation-key bundle on a context built with the
    SAME params (the context's own random secret/relin key are replaced;
    an sk-less server context evaluates bitwise-identically to the key
    owner's).  Cached jitted kernels that baked the old keys in as traced
    constants (multiply/rotate/hoisting) are dropped.

    Call this BEFORE constructing engines (BsgsMatvec / model runtimes):
    an engine built earlier keeps stale stacked copies of the OLD keys in
    its `_xs_cache` and will keep evaluating with them (ADVICE r4 #4).
    If the context had `shard_eval_keys` applied, the loaded keys are
    re-padded and re-placed with the stored sharding, so the
    sharded-context invariant (every eval key padded + limb-sharded)
    survives the install."""
    import jax.numpy as jnp

    from ..ckks.context import KeySwitchKey

    z = np.load(path)
    assert int(z["n"]) == ctx.n and int(z["L"]) == ctx.L \
        and int(z["K"]) == ctx.K and int(z["dnum"]) == ctx.dnum, (
        "eval-key bundle was built for different CKKS params")
    saved = bytes(z["order"]).decode()
    cur = getattr(ctx.ntt, "order", "stockham")
    assert saved == cur, (
        f"eval keys were serialized from a {saved!r}-order context; this "
        f"context's NTT backend is {cur!r} — eval-domain bin orders differ")
    ctx.relin_key = KeySwitchKey(jnp.asarray(z["relin_b"]),
                                 jnp.asarray(z["relin_a"]))
    ctx.galois_keys.clear()
    for g in z["galois_elts"].tolist():
        ctx.galois_keys[int(g)] = KeySwitchKey(jnp.asarray(z[f"gk{g}_b"]),
                                               jnp.asarray(z[f"gk{g}_a"]))
    if "id_b" in z:
        ctx._identity_ksk = KeySwitchKey(jnp.asarray(z["id_b"]),
                                         jnp.asarray(z["id_a"]))
    elif hasattr(ctx, "_identity_ksk"):
        del ctx._identity_ksk
    # a sharded context's keys must stay padded + placed: re-apply the
    # stored placement to the freshly loaded (unpadded, host) keys
    if getattr(ctx, "_eval_key_sharding", None) is not None:
        put = ctx._eval_key_put
        ctx.relin_key = KeySwitchKey(*put(ctx.relin_key.b,
                                          ctx.relin_key.a))
        for g, k in list(ctx.galois_keys.items()):
            ctx.galois_keys[g] = KeySwitchKey(*put(k.b, k.a))
        if hasattr(ctx, "_identity_ksk"):
            ctx._identity_ksk = KeySwitchKey(*put(ctx._identity_ksk.b,
                                                  ctx._identity_ksk.a))
    # _j_mul/_j_rotate/_j_hoisted close over key tensors at trace time
    for name in ("_j_mul", "_j_rotate", "_j_hoisted"):
        getattr(type(ctx), name).cache_clear()


def save_generation_state(path: str, state, tokens: list[int]) -> None:
    """RWKV recurrent state + token history (resume mid-generation)."""
    np.savez_compressed(
        path,
        tokens=np.asarray(tokens, dtype=np.int64),
        n_blocks=len(state.wkv),
        **{f"xa{i}": a for i, a in enumerate(state.x_prev_att)},
        **{f"xf{i}": a for i, a in enumerate(state.x_prev_ffn)},
        **{f"wkv{i}": a for i, a in enumerate(state.wkv)},
    )


def load_generation_state(path: str):
    from ..models.rwkv7 import RwkvState

    z = np.load(path)
    nb = int(z["n_blocks"])
    state = RwkvState(
        x_prev_att=[z[f"xa{i}"] for i in range(nb)],
        x_prev_ffn=[z[f"xf{i}"] for i in range(nb)],
        wkv=[z[f"wkv{i}"] for i in range(nb)],
    )
    return state, z["tokens"].tolist()
