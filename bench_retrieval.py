"""Encrypted-retrieval benchmark: column-packed CT-CT scores/sec vs corpus
size (the reference's headline table: 50k docs in 630 ms = 13 us/doc on
an A100, paper/main.tex:778-785).

Prints one JSON line with per-doc latency at the largest corpus.
"""

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("BENCH_N", "8192"))
    dim = int(os.environ.get("BENCH_DIM", "64"))
    sizes = [int(s) for s in os.environ.get(
        "BENCH_SIZES", "1000,10000,50000").split(",")]

    from fhe_spear_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    log(f"devices: {jax.devices()}")

    from fhe_spear_tpu.ckks import CkksContext, CkksParams
    from fhe_spear_tpu.ops.retrieval import ColumnPackedRetrieval

    t0 = time.perf_counter()
    ctx = CkksContext(CkksParams.retrieval(n=n), seed=0)
    log(f"context ({time.perf_counter() - t0:.1f}s)")
    eng = ColumnPackedRetrieval(ctx, dim=dim, lorentz=True)

    rng = np.random.RandomState(0)
    rows = []
    for n_docs in sizes:
        docs = rng.rand(n_docs, dim) * 2 - 1
        docs /= np.linalg.norm(docs, axis=1, keepdims=True)
        q = rng.rand(dim) * 2 - 1
        q /= np.linalg.norm(q)
        t0 = time.perf_counter()
        corpus = eng.encrypt_corpus(docs)
        t_enc = time.perf_counter() - t0
        qct = eng.encrypt_query(q)
        # warm compile, then measure the server-side scoring alone
        ct = eng.scores(corpus, qct)
        ct.c.block_until_ready()
        t0 = time.perf_counter()
        ct = eng.scores(corpus, qct)
        ct.c.block_until_ready()
        t_score = time.perf_counter() - t0
        scores = eng.decode_scores(ct, n_docs)
        true = None
        from fhe_spear_tpu.ops.packing import euclidean_to_lorentz, lorentz_inner
        true = lorentz_inner(euclidean_to_lorentz(q),
                             euclidean_to_lorentz(docs))
        exact = int(np.argmax(scores) == np.argmax(true))
        corr = float(np.corrcoef(scores, true)[0, 1])
        rows.append({"docs": n_docs, "score_ms": t_score * 1e3,
                     "us_per_doc": t_score * 1e6 / n_docs,
                     "encrypt_s": t_enc, "top1_exact": exact, "corr": corr})
        log(f"{n_docs} docs: score {t_score * 1e3:.1f} ms "
            f"({t_score * 1e6 / n_docs:.2f} us/doc), corr {corr:.6f}")

    last = rows[-1]
    ref_us_per_doc = 630e3 / 50e3   # 12.6 us/doc (A100)
    print(json.dumps({
        "metric": f"CT-CT retrieval us/doc at {last['docs']} docs "
                  f"({dim}d Lorentz, N={n})",
        "value": round(last["us_per_doc"], 3),
        "unit": "us/doc",
        "vs_baseline": round(ref_us_per_doc / last["us_per_doc"], 2),
        "detail": rows,
    }))


if __name__ == "__main__":
    main()
