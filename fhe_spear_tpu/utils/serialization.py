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
