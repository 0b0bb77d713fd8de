"""Limb-sharded fully-encrypted chain at the reference ring N=16384 on a
virtual 8-device mesh (VERDICT r4 Missing #1 stand-in evidence).

The 24-block 4-bootstrap reference config (paper/main.tex:1131,
test_fully_enc_bsgs.py:238-267) runs at N=16384/L=46 — a working set a
single v5e's HBM cannot hold without the warm/free key discipline.  The
multi-chip answer is RNS-limb sharding (CkksContext.shard_eval_keys +
FullyEncryptedFfn(key_sharding=...)): keys and key stacks partition on
the limb axis, so per-chip key HBM divides by the mesh size.  This tool
runs the production-geometry chain (D=2048, F=8192, N=16384, L=46, K=8,
dnum=6) LIMB-SHARDED over an 8-device CPU mesh, verifies every block
against the plaintext oracle, and reports the per-device key bytes.

Env: LS_BLOCKS (2), LS_DEVICES (8), LS_D (2048), LS_F (8192),
LS_N (16384), LS_LIMBS (46).  Prints ONE JSON line.
"""

import json
import os
import sys
import time

# CPU with a virtual mesh — must be set before jax import
flags = os.environ.get("XLA_FLAGS", "")
ndev = int(os.environ.get("LS_DEVICES", "8"))
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={ndev}").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from fhe_spear_tpu.ckks import CkksContext, CkksParams
    from fhe_spear_tpu.models.fully_encrypted import (
        FullyEncryptedFfn, calibrate_magnitude, fe_level_schedule,
        plaintext_ffn_block, pre_encode_blocks)

    d = int(os.environ.get("LS_D", "2048"))
    f = int(os.environ.get("LS_F", "8192"))
    n = int(os.environ.get("LS_N", "16384"))
    limbs = int(os.environ.get("LS_LIMBS", "46"))
    blocks = int(os.environ.get("LS_BLOCKS", "2"))

    devs = jax.devices()[:ndev]
    assert len(devs) == ndev, (len(devs), ndev)
    mesh = Mesh(np.array(devs), ("limb",))
    sh = NamedSharding(mesh, P(None, "limb", None))
    log(f"mesh: {ndev} devices on axis 'limb'")

    t0 = time.perf_counter()
    # the fe24boot geometry (L=46, K=8, dnum=6) minus the sparse secret
    # (no refresh in this stand-in chain)
    params = CkksParams(n=n, num_limbs=limbs, num_special=8, dnum=6)
    ctx = CkksContext(params, seed=0)
    log(f"context N={n} L={limbs} K=8 dnum=6 "
        f"({time.perf_counter() - t0:.1f}s)")

    rng = np.random.default_rng(42)
    w_keys = [rng.standard_normal((d, f)) / np.sqrt(d) for _ in range(blocks)]
    w_vals = [rng.standard_normal((f, d)) / np.sqrt(f) for _ in range(blocks)]
    x0 = np.random.default_rng(4242).uniform(-1, 1, d)
    w_keys, w_vals = calibrate_magnitude(w_keys, w_vals, x0)

    t0 = time.perf_counter()
    ctx.shard_eval_keys(sh)
    log(f"eval keys limb-sharded ({time.perf_counter() - t0:.1f}s)")

    eng = FullyEncryptedFfn(ctx, d, f, seq_chunks=True, stage_mode="i32",
                            key_sharding=sh)
    levels = fe_level_schedule(limbs, blocks)
    hosts = pre_encode_blocks(eng, w_keys, w_vals, levels=levels,
                              cache_dir=f"/tmp/ls16k_preenc_{d}_{f}_{n}",
                              log_fn=log)

    # per-device key bytes: every eval key + the stacked xs tensors are
    # sharded on the limb axis
    def sharded_bytes():
        tot = 0
        for k in list(ctx.galois_keys.values()) + [ctx.relin_key]:
            tot += k.b.nbytes + k.a.nbytes
        return tot

    key_bytes = sharded_bytes()
    log(f"total eval-key bytes {key_bytes/2**30:.2f} GiB "
        f"-> {key_bytes/ndev/2**30:.2f} GiB/device")

    x_ref = np.asarray(x0, dtype=np.float64).copy()
    refs = [x_ref.copy()]
    for wk, wv in zip(w_keys, w_vals):
        x_ref = plaintext_ffn_block(x_ref, wk, wv)
        refs.append(x_ref.copy())

    ct = ctx.encrypt_replicated(x0)
    stats = []
    for b in range(blocks):
        t0 = time.perf_counter()
        ct = eng(ct, eng.load_block(hosts[b], ct.level))
        jax.block_until_ready(ct.c)
        dt = time.perf_counter() - t0
        dec = ctx.decrypt_vec(ct, d)
        corr = float(np.corrcoef(dec, refs[b + 1])[0, 1])
        err = float(np.max(np.abs(dec - refs[b + 1])))
        stats.append({"block": b, "corr": corr, "max_err": err, "sec": dt})
        log(f"  block {b}: corr={corr:.10f} max_err={err:.2e} {dt:.1f}s")

    min_corr = min(s["corr"] for s in stats)
    print(json.dumps({
        "metric": f"limb-sharded FE chain D={d} F={f} N={n} L={limbs} "
                  f"({ndev}-device virtual mesh)",
        "value": round(min_corr, 10),
        "unit": "min per-block corr",
        "vs_baseline": None,
        "detail": {
            "blocks": blocks,
            "max_err": max(s["max_err"] for s in stats),
            "eval_key_GiB_total": round(key_bytes / 2**30, 3),
            "eval_key_GiB_per_device": round(key_bytes / ndev / 2**30, 3),
            "mesh_devices": ndev,
            "note": ("virtual CPU mesh: proves the sharded compile+math "
                     "at the reference ring; wall-clock is not a "
                     "multi-chip claim (README multi-chip limitation)"),
        },
    }))


if __name__ == "__main__":
    main()
