"""CKKS bootstrap timing benchmark (reference: ~0.7 s per refresh on A100
at N=16384, paper/main.tex:1138).

Refreshes a depleted ciphertext and reports wall time + refresh error.
Default N=2048 (22 limbs, sparse secret h=64); set BENCH_N/BENCH_LIMBS.
"""

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("BENCH_N", "2048"))
    limbs = int(os.environ.get("BENCH_LIMBS", "22"))
    special = int(os.environ.get("BENCH_SPECIAL", "2"))
    dnum = int(os.environ.get("BENCH_DNUM", "0")) or None
    radix = int(os.environ.get("BENCH_RADIX", "4")) or None

    from fhe_spear_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    log(f"devices: {jax.devices()}")

    from fhe_spear_tpu.ckks import CkksContext, CkksParams
    from fhe_spear_tpu.ckks.bootstrap import Bootstrapper

    t0 = time.perf_counter()
    ctx = CkksContext(CkksParams.bootstrap(n=n, num_limbs=limbs,
                                           num_special=special, hamming=64,
                                           dnum=dnum),
                      seed=0)
    log(f"context ({time.perf_counter() - t0:.1f}s)")
    t0 = time.perf_counter()
    deg = int(os.environ.get("BENCH_EXP_DEGREE", "31"))
    margin = int(os.environ.get("BENCH_MARGIN_BITS", "3"))
    width = int(os.environ.get("BENCH_WIDTH", "1"))
    bt = Bootstrapper(ctx, exp_degree=deg, margin_bits=margin, radix=radix,
                      evalmod_width=width)
    log(f"bootstrapper setup ({time.perf_counter() - t0:.1f}s)")

    rng = np.random.default_rng(1)
    m = rng.uniform(-0.8, 0.8, ctx.slots)
    ct = ctx.mod_switch_to(ctx.encrypt(m), 2)

    t0 = time.perf_counter()
    out = bt.bootstrap(ct)                  # includes compilation
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = bt.bootstrap(ct)
    t_steady = time.perf_counter() - t0
    got = ctx.decrypt_vec(out)
    err = float(np.abs(got - m).max())
    corr = float(np.corrcoef(got, m)[0, 1])
    log(f"first {t_first:.2f}s steady {t_steady:.2f}s err {err:.2e} "
        f"corr {corr:.6f} out_level {out.level}")

    print(json.dumps({
        "metric": f"CKKS bootstrap wall time, N={n}, L={limbs}, h=64"
                  + (f", dnum={dnum}" if dnum else "")
                  + (f", radix={radix}" if radix else " (dense C2S)"),
        "value": round(t_steady, 3),
        "unit": "s",
        "vs_baseline": round(0.7 / t_steady, 3),
        "detail": {"refresh_max_err": err, "corr": corr,
                   "output_level": out.level, "first_call_s": round(t_first, 1)},
    }))


if __name__ == "__main__":
    main()
