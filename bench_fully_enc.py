"""Fully-encrypted FFN inference at reference scale (SURVEY.md C11).

Reference bar: D=2048, F=8192, 19 blocks, no bootstrap, corr 1.000000,
70 s/block on A100 at N=32768/L0=60/P=3 (paper/main.tex:1130); and the
24-block 4-bootstrap config at 40 s/block (paper/main.tex:1131).

This backend uses 28-bit limbs, so the reference's 60x40-bit chain maps
to 3 limbs/block + q0: L = 3*blocks + 2.  Deep chains force i32 staging
(diagonals as int32 coefficients in HBM, per-giant-group RNS expansion
in-kernel) and a dnum-grouped hybrid keyswitch (single-limb digits at
l~60 would need ~500 MB/rotation-key and l NTT extensions per rotation).

Env: BENCH_D/F/N/BLOCKS, BENCH_DNUM (digit groups), BENCH_SPECIAL,
BENCH_BOOTSTRAP=1 to enable mid-chain refresh (requires sparse secret),
BENCH_PASSES (default 2: first pass compiles, second is steady state).

Prints ONE JSON line; progress to stderr.
"""

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    d = int(os.environ.get("BENCH_D", "2048"))
    f = int(os.environ.get("BENCH_F", "8192"))
    n = int(os.environ.get("BENCH_N", "16384"))
    blocks = int(os.environ.get("BENCH_BLOCKS", "19"))
    use_boot = os.environ.get("BENCH_BOOTSTRAP", "0") == "1"
    passes = int(os.environ.get("BENCH_PASSES", "2"))
    # BENCH_WIDTH=2: reference-precision mode (composite ~2^56 scale, 6
    # limbs/block — target the reference's 9.3e-9 absolute-error bar)
    width = int(os.environ.get("BENCH_WIDTH_CHAIN", "1"))
    assert not (use_boot and width == 2), "width-2 + bootstrap not wired"
    baseline = 40.0 if use_boot else 70.0

    from fhe_spear_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    if os.environ.get("FHE_FORCE_CPU") == "1":
        # structural-twin mode: the sitecustomize force-registers the TPU
        # tunnel and JAX_PLATFORMS env alone is ignored (conftest.py)
        jax.config.update("jax_platforms", "cpu")
    log(f"devices: {jax.devices()}")

    from fhe_spear_tpu.ckks import CkksContext, CkksParams
    from fhe_spear_tpu.models.fully_encrypted import (
        FullyEncryptedFfn, calibrate_magnitude, run_fully_encrypted,
        pre_encode_blocks, fe_level_schedule)

    # --- parameters -------------------------------------------------------
    if use_boot:
        # chain design (r4): the production-quality refresh (width 2,
        # exp_degree 31, radix 4 -> 4+4 stage groups at slots=8192)
        # consumes 37 limbs (measured, small-ring structural twin in
        # docs/NOTES_r4.md), so L=46 lands refreshes at level 9 = 2 blocks
        # per refresh; 14 initial blocks + 5 refreshes covers 24 blocks.
        # K=8 specials with dnum=ceil(L/8) keeps the 89-key set ~3.6 GB
        # (vs 6.7 GB at K=4/dnum=12) so keys + one xs stack + block
        # staging fit one v5e.
        limbs = int(os.environ.get("BENCH_LIMBS", "46"))
        special = int(os.environ.get("BENCH_SPECIAL", "8"))
        dnum = int(os.environ.get("BENCH_DNUM", str(-(-limbs // special))))
        params = CkksParams.bootstrap(n=n, num_limbs=limbs,
                                      num_special=special, hamming=64,
                                      dnum=dnum)
    else:
        default_l = 6 * blocks + 3 if width == 2 else 3 * blocks + 2
        limbs = int(os.environ.get("BENCH_LIMBS", str(default_l)))
        special = int(os.environ.get("BENCH_SPECIAL", "8"))
        dnum = int(os.environ.get("BENCH_DNUM", "8"))
        params = CkksParams(n=n, num_limbs=limbs, num_special=special,
                            dnum=dnum)

    t0 = time.perf_counter()
    ctx = CkksContext(params, seed=0)
    log(f"context N={n} L={limbs} K={special} dnum={dnum} "
        f"({time.perf_counter() - t0:.1f}s)")

    # --- model (random weights; FHE correctness is weight-independent —
    # test_fully_enc_bsgs.py random-weight mode, seed 42) ------------------
    # x0 comes from its OWN seeded stream: drawing it from the weight rng
    # made it depend on whether the weight files already existed (a cache
    # hit skips the standard_normal draws) — runs then calibrated their
    # plaintext reference against a DIFFERENT x0 than the one the cached
    # pre-encoded diagonals were calibrated with, a deterministic
    # signal-proportional mismatch that compounds through the chain
    # (~5.8e-3 at block 0, ~0.21 by block 2 in the r4 fe19 runs; likely
    # a contributor to the r3 fe19 corr-0.997 artifact as well).
    rng = np.random.default_rng(42)
    x0 = np.random.default_rng(4242).uniform(-1, 1, d)
    wdir = f"/tmp/fe_model_{d}_{f}_{blocks}"
    os.makedirs(wdir, exist_ok=True)
    w_keys, w_vals = [], []
    t0 = time.perf_counter()
    for b in range(blocks):
        kf = os.path.join(wdir, f"k{b:03d}.npy")
        vf = os.path.join(wdir, f"v{b:03d}.npy")
        if not (os.path.exists(kf) and os.path.exists(vf)):
            np.save(kf, (rng.standard_normal((d, f)) / np.sqrt(d)
                         ).astype(np.float64))
            np.save(vf, (rng.standard_normal((f, d)) / np.sqrt(f)
                         ).astype(np.float64))
        w_keys.append(np.load(kf, mmap_mode="r"))
        w_vals.append(np.load(vf, mmap_mode="r"))
    log(f"weights ({time.perf_counter() - t0:.1f}s)")

    # --- calibrate + pre-encode (cached) ----------------------------------
    t0 = time.perf_counter()
    # BENCH_TARGET_MAG > 1 trades decrypt headroom (2-limb CRT: ~2^30 x
    # scale) for signal-to-noise: CKKS noise is absolute, so running the
    # chain at magnitude m divides every relative error by m.  4 is the
    # int32-encode-safe maximum (coefficients m * 2^28 < 2^31).
    tmag = float(os.environ.get("BENCH_TARGET_MAG", "1.0"))
    w_keys, w_vals = calibrate_magnitude(w_keys, w_vals, x0,
                                         target_mag=tmag)
    log(f"magnitude calibration (target {tmag}, "
        f"{time.perf_counter() - t0:.1f}s)")

    eng = FullyEncryptedFfn(ctx, d, f, seq_chunks=True, stage_mode="i32",
                            width=width)
    # exact-scale encodes depend on the context's prime chain, so the
    # cache key carries a q-chain hash — a different BENCH_LIMBS/preset
    # must never silently reuse another chain's diagonals (ADVICE r3 #4)
    import hashlib

    # hash the SCALE chain only (first L primes): encode scales are
    # independent of the special primes, so a BENCH_SPECIAL change reuses
    # the same diagonals.  The CALIBRATED weights (x0-dependent) are part
    # of the cached bytes, so the key also fingerprints x0 — a mismatch
    # here is exactly the silent-corruption class of ADVICE r3 #4.
    qh = hashlib.sha1(np.asarray(ctx.q_np[:limbs], dtype=np.uint64)
                      .tobytes()).hexdigest()[:10]
    xh = hashlib.sha1(np.asarray(x0, dtype=np.float64).tobytes()
                      ).hexdigest()[:8]
    cache = f"/tmp/fe_preenc_{d}_{f}_{blocks}_{n}_q{qh}_x{xh}" + (
        f"_m{tmag:g}" if tmag != 1.0 else "") + (
        f"_w{width}" if width != 1 else "")
    # exact-alignment encode levels (diagonals are level-specific so the
    # block output scale equals its input scale exactly — no relabel error).
    # For bootstrap runs the refresh output level is set via
    # BENCH_BOOT_LEVEL (a wrong guess self-corrects: the runner re-encodes
    # on mismatch and later passes hit steady state).
    boot_lv = int(os.environ.get("BENCH_BOOT_LEVEL", "0")) or None
    levels = fe_level_schedule(limbs, blocks, boot_level=boot_lv,
                               width=width)
    t0 = time.perf_counter()
    hosts = pre_encode_blocks(eng, w_keys, w_vals, cache_dir=cache,
                              log_fn=log, levels=levels)
    log(f"pre-encode ({time.perf_counter() - t0:.1f}s)")

    if os.environ.get("BENCH_PREP_ONLY") == "1":
        # cache-warming mode: weights + host pre-encode only (run on CPU
        # ahead of the TPU measurement; caches are device-independent)
        print(json.dumps({"metric": "prep-only", "value": 1, "unit": "",
                          "vs_baseline": None, "detail": {"cache": cache}}))
        return

    boot_fn = None
    bt = None
    if use_boot:
        from fhe_spear_tpu.ckks.bootstrap import Bootstrapper

        t0 = time.perf_counter()
        # width 2 is mandatory at production rings: the width-1 refresh
        # error is ~0.27 at N=8192 (28-bit noise floor x gamma x sqrt(S)
        # amplification); width 2 measured 5.8e-3 at N=16384
        # (BENCH_LOCAL_r3_boot16k.json)
        bt = Bootstrapper(
            ctx,
            exp_degree=int(os.environ.get("BENCH_EXP_DEGREE", "31")),
            radix=int(os.environ.get("BENCH_RADIX", "4")),
            evalmod_width=int(os.environ.get("BENCH_WIDTH", "2")),
            margin_bits=int(os.environ.get("BENCH_MARGIN_BITS", "3")))
        boot_fn = bt.bootstrap
        log(f"bootstrapper ({time.perf_counter() - t0:.1f}s)")

    if os.environ.get("FHE_WARM_FREE") == "1":
        # Warm every engine's stacked keys, then FREE the raw per-element
        # Galois keys: at N=16384/L=46/dnum=6 the ~200 raw keys (~9 GB)
        # otherwise sit in HBM next to their stacked copies for the whole
        # run — the 17.2 GB OOM of the r4 fe24boot attempt.  Sequencing
        # caps the peak: FE stack first, drop its elements, then one
        # dummy refresh builds the bootstrap stage stacks (also paying
        # their compiles outside the timed loop), then drop the rest.
        import jax as _jax

        from fhe_spear_tpu.utils.retry import retry_transient

        t0 = time.perf_counter()
        fe_elts = retry_transient(eng.eng.warm_stacks, log_fn=log)
        boot_elts = bt.galois_elements() if bt is not None else set()
        nd = ctx.drop_galois_keys(drop=fe_elts - boot_elts)
        log(f"warm/free: FE stack built, {nd} raw BSGS keys dropped "
            f"({time.perf_counter() - t0:.1f}s)")
        if bt is not None:
            t0 = time.perf_counter()
            ct_w = ctx.mod_switch_to(
                ctx.encrypt_replicated(np.zeros(d)), 2)
            import jax

            retry_transient(
                lambda: jax.block_until_ready(bt.bootstrap(ct_w).c),
                log_fn=log)
            nd = ctx.drop_galois_keys()
            log(f"warm/free: dummy refresh done, {nd} raw keys dropped "
                f"({time.perf_counter() - t0:.1f}s)")

    # --- run passes -------------------------------------------------------
    all_stats = []
    for ps in range(passes):
        t0 = time.perf_counter()
        stats = run_fully_encrypted(
            ctx, w_keys, w_vals, x0, bootstrap_fn=boot_fn,
            pre_encoded=hosts, eng=eng, calibrated=True,
            verbose=False, log_fn=log, cache_dir=cache)
        log(f"pass {ps}: {time.perf_counter() - t0:.1f}s total, "
            f"{len(stats)} blocks")
        all_stats.append(stats)

    final = all_stats[-1]
    # steady-state per-block: the tunnel stalls for 10-20 min roughly
    # once an hour (docs/NOTES_r5.md) and a stall lands inside ONE
    # block's timer — with >= 2 measurement passes, the per-block MIN
    # across passes is a stall-robust steady estimate (every block's
    # min is a genuinely observed end-to-end time)
    measure = all_stats[1:] if len(all_stats) > 1 else all_stats
    per_block_min = [min(ps[i]["sec"] for ps in measure)
                     for i in range(len(final))]
    per_block = float(np.mean(per_block_min))
    min_corr = min(s["corr"] for s in final)
    max_err = max(s["max_err"] for s in final)
    n_boot = final[-1]["bootstraps"] if final else 0

    print(json.dumps({
        "metric": f"fully-encrypted FFN s/block D={d} F={f} N={n} "
                  f"{len(final)} blocks"
                  + (f" ({n_boot} bootstraps)" if use_boot else
                     " (no bootstrap)")
                  + (" width-2" if width == 2 else ""),
        "value": round(per_block, 3),
        "unit": "s/block",
        "vs_baseline": round(baseline / per_block, 3),
        "detail": {
            "blocks": len(final),
            "min_corr": round(min_corr, 8),
            "max_err": max_err,
            "bootstraps": n_boot,
            "final_level": final[-1]["level"] if final else None,
            "per_block_min_s": [round(s, 2) for s in per_block_min],
            "per_pass_mean_s": [round(float(np.mean([s["sec"] for s in ps])),
                                      2) for ps in all_stats],
            "stat": "mean of per-block min across measurement passes",
        },
    }))


if __name__ == "__main__":
    main()
