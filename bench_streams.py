"""Aggregate-throughput benchmark: S independent generation streams batched
through one fused transport (see models/client_aided.run_generation_batched).

Prints one JSON line: aggregate tokens/s at the headline config and the
implied per-token speedup vs the reference's single-stream 79 s/token.
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
    num_blocks = int(os.environ.get("BENCH_BLOCKS", "4"))
    num_tokens = int(os.environ.get("BENCH_TOKENS", "2"))
    streams = int(os.environ.get("BENCH_STREAMS", "8"))
    os.environ.setdefault("FHE_PREENC_CACHE", "/tmp/fhe_preenc_cache")

    from fhe_spear_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    log(f"devices: {jax.devices()}")

    mode = os.environ.get("BENCH_MODE", "classic")

    from fhe_spear_tpu.ckks import CkksContext, CkksParams
    from fhe_spear_tpu.models.rwkv7 import make_random_model, load_model, \
        save_model
    from fhe_spear_tpu.models.client_aided import run_generation_batched

    cache = f"/tmp/bench_model_{d}_{f}_{num_blocks}.dir"
    t0 = time.perf_counter()
    if os.path.exists(cache):
        model = load_model(cache)
    else:
        model = make_random_model(d=d, f=f, n_blocks=num_blocks, head_size=64,
                                  vocab=1000, seed=42)
        save_model(cache, model)
    log(f"model ready ({time.perf_counter() - t0:.1f}s)")

    t0 = time.perf_counter()
    ctx = CkksContext(CkksParams(n=n, num_limbs=3, num_special=1), seed=0)
    log(f"context + keys ({time.perf_counter() - t0:.1f}s)")

    if mode == "device":
        # device-client streams: ONE dispatch advances all S sequences
        from fhe_spear_tpu.models.device_client import DeviceTokenRunner
        from fhe_spear_tpu.models.rwkv7 import generate_token_plaintext

        runner = DeviceTokenRunner(
            ctx, model, level=3,
            cache_dir=os.environ.get("FHE_PREENC_CACHE"))
        rng = np.random.default_rng(7)
        toks = list(rng.integers(0, model.emb.shape[0], streams))
        ref_toks = list(toks)
        states = [model.zero_state() for _ in range(streams)]
        ref_states = [model.zero_state() for _ in range(streams)]
        results = []
        for step in range(num_tokens + 1):
            t0 = time.perf_counter()
            logits, states = runner.generate_tokens_streams(toks, states)
            dt = time.perf_counter() - t0
            match = 0
            for s in range(streams):
                lr, ref_states[s] = generate_token_plaintext(
                    model, ref_toks[s], ref_states[s])
                ref_toks[s] = int(np.argmax(lr))
                toks[s] = int(np.argmax(logits[s]))
                match += toks[s] == ref_toks[s]
            results.append({"sec": dt, "match": match})
            log(f"step {step}: {dt:.2f}s match {match}/{streams}")
    else:
        results = run_generation_batched(ctx, model, None,
                                         num_tokens=num_tokens + 1,
                                         streams=streams, level=3,
                                         verbose=False, log_fn=log)
    steady = results[1:]
    per_token = float(np.mean([r["sec"] for r in steady])) / num_blocks * 24
    agg = streams / per_token
    all_match = all(r["match"] == streams for r in results)
    print(json.dumps({
        "metric": f"aggregate tokens/s, {streams} streams, client-aided "
                  f"RWKV-7 D={d} F={f} N={n} "
                  f"({'device-client, ' if mode == 'device' else ''}"
                  f"{'24-block measured' if num_blocks == 24 else '24-block extrapolated'})",
        "value": round(agg, 3),
        "unit": "tokens/s",
        "vs_baseline": round(agg / (1.0 / 79.0), 1),
        "detail": {"per_token_s": round(per_token, 3), "streams": streams,
                   "all_streams_match_plaintext": all_match},
    }))


if __name__ == "__main__":
    main()
