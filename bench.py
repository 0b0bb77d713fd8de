"""Benchmark: client-aided RWKV-7 token generation under CKKS on one chip.

Reproduces the reference's headline config (D=2048, F=8192, N=8192,
3-limb budget — paper/main.tex:1065: 79 s/token on A100 with CPU-offloaded
pre-encoded diagonals) with random weights (seeded; FHE correctness is
independent of weight values — test_fully_enc_bsgs.py random-weight mode).

Runs BENCH_BLOCKS blocks (default 24 — a TRUE measured 24-block token,
not an extrapolation) for BENCH_TOKENS+1 tokens (first token warms up
compilation), measures steady-state per-block time, and reports
sec/token.  vs_baseline = 79 / value (speedup over the reference's A100
number; > 1 is faster).  Default stage mode is i32 (all 24 blocks'
diagonals HBM-resident as int32 coefficients with in-kernel RNS
expansion — the only mode where 24 blocks fit on one chip).

Default transport is BENCH_MODE=device (the whole token — all blocks x
4 protocol round trips, client nonlinearities included — as ONE jitted
lax.scan dispatch; measured 11.16 s/token TRUE 24-block on v5e).  Set
BENCH_MODE=classic for the per-round-trip transport (BENCH_FUSED=0 for
explicit-ciphertext wire accounting).

Prints exactly ONE JSON line on stdout; progress goes to stderr.
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
    n = int(os.environ.get("BENCH_N", "8192"))
    num_blocks = int(os.environ.get("BENCH_BLOCKS", "24"))
    num_tokens = int(os.environ.get("BENCH_TOKENS", "3"))
    baseline = 79.0

    os.environ.setdefault("FHE_PREENC_CACHE", "/tmp/fhe_preenc_cache")
    # 24 resident blocks only fit as int32 coefficients (in-kernel RNS
    # expansion); smaller configs default to pre-expanded staging
    os.environ.setdefault("FHE_STAGE_MODE",
                          "i32" if num_blocks > 8 else "expanded")

    from fhe_spear_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    log(f"devices: {jax.devices()}")

    from fhe_spear_tpu.ckks import CkksContext, CkksParams
    from fhe_spear_tpu.models.rwkv7 import make_random_model
    from fhe_spear_tpu.models.client_aided import run_generation

    t0 = time.perf_counter()
    cache = f"/tmp/bench_model_{d}_{f}_{num_blocks}.dir"
    if os.path.exists(cache):
        from fhe_spear_tpu.models.rwkv7 import load_model

        model = load_model(cache)
        log(f"model loaded from cache ({time.perf_counter() - t0:.1f}s)")
    else:
        model = make_random_model(d=d, f=f, n_blocks=num_blocks, head_size=64,
                                  vocab=1000, seed=42)
        from fhe_spear_tpu.models.rwkv7 import save_model

        save_model(cache, model)
        log(f"model built ({time.perf_counter() - t0:.1f}s)")

    t0 = time.perf_counter()
    # NTT backend knob: stockham (XLA chain, the measured-fastest default
    # — at production batches it runs at the VPU u32-multiply compute
    # bound, ~3.1 us/poly at N=8192), pallas (fused VMEM kernel, bitwise-
    # equal, within ~30% of stockham), or mxu (four-step systolic)
    backend = os.environ.get("BENCH_NTT_BACKEND", "stockham")
    ctx = CkksContext(CkksParams(n=n, num_limbs=3, num_special=1,
                                 ntt_backend=backend), seed=0)
    log(f"context + keys (ntt_backend={backend}, "
        f"{time.perf_counter() - t0:.1f}s)")

    mode = os.environ.get("BENCH_MODE", "device")
    if mode == "device" and "BENCH_FUSED" in os.environ:
        log("WARNING: BENCH_FUSED is ignored in device transport; set "
            "BENCH_MODE=classic for explicit-ciphertext wire accounting")
    if mode == "device":
        # device-resident client: ONE dispatch per token (the whole
        # 24-block x 4-round-trip protocol as a single jitted scan)
        from fhe_spear_tpu.models.device_client import run_generation_device

        results = run_generation_device(
            ctx, model, seed_tokens=[5, 11, 2], num_tokens=num_tokens + 1,
            level=3, cache_dir=os.environ.get("FHE_PREENC_CACHE"),
            log_fn=log)
    else:
        results = run_generation(
            ctx, model, seed_tokens=[5, 11, 2],
            num_tokens=num_tokens + 1, level=3, verbose=False,
            fused=os.environ.get("BENCH_FUSED", "1") == "1",
            log_fn=log)
    for i, r in enumerate(results):
        log(f"token {i}: match={r['match']} corr={r['corr']:.6f} "
            f"{r['sec']:.2f}s")

    # median of post-warmup tokens: the remote compile cache occasionally
    # recompiles mid-run (observed once: token 1 took 318 s between 9.3 s
    # steady tokens) — that is warmup, not steady state, and a mean over
    # 2-3 tokens would report it as such
    steady = [r["sec"] for r in results[1:]]
    per_block = float(np.median(steady)) / num_blocks
    sec_per_token = per_block * 24
    all_match = all(r["match"] for r in results)
    min_corr = min(r["corr"] for r in results)

    kind = ("24-block measured" if num_blocks == 24
            else f"{num_blocks}-block, x24/{num_blocks} extrapolated")
    if mode == "device":
        kind += ", device-client"
    fused = os.environ.get("BENCH_FUSED", "1") == "1" and mode != "device"
    # classic-transport wire volume: Ciphertext [2, l, N] uint32 per hop;
    # per block the protocol moves 7 up + 8 down = 15 ciphertexts
    # (rt1: 3/3, rt2: 1/1, rt3: 1/P, rt4: P/P with P=2 at F=8192)
    ct_bytes = 2 * 3 * n * 4
    wire = {"ciphertext_bytes": ct_bytes,
            "cts_per_block_up_down": [7, 8],
            "bytes_per_token_24_blocks": 15 * ct_bytes * 24}
    print(json.dumps({
        "metric": f"sec/token client-aided RWKV-7 D={d} F={f} N={n} "
                  f"({kind})",
        "value": round(sec_per_token, 3),
        "unit": "s/token",
        "vs_baseline": round(baseline / sec_per_token, 3),
        "detail": {
            "per_block_s": round(per_block, 4),
            "blocks_measured": num_blocks,
            "tokens_match_plaintext": all_match,
            "min_logit_corr": round(min_corr, 6),
            "transport": ("device-client" if mode == "device"
                          else "fused" if fused else "explicit-ciphertext"),
            "wire": wire if not fused and mode != "device" else None,
        },
    }))


if __name__ == "__main__":
    main()
