"""Simulator-vs-real-encryption speed benchmark (C16 parity,
/root/reference/fhesim/benchmark_speed.py: 500-8000x speedups there).

Measures wall-clock for scoring a corpus with the Gaussian simulator vs
the real CT-CT column-packed engine at several ring dimensions.
"""

from __future__ import annotations

import time

import numpy as np

from .simulator import FheAccuracySimulator, _normalize


def run(ns=(2048, 4096), n_docs=256, dim=32, seed=0, verbose=True):
    from ..ckks import CkksContext, CkksParams
    from ..ops.retrieval import ColumnPackedRetrieval

    rng = np.random.default_rng(seed)
    docs = _normalize(rng.normal(0, 1, (n_docs, dim)))
    q = _normalize(rng.normal(0, 1, dim))
    rows = []
    for n in ns:
        sim = FheAccuracySimulator(poly_modulus_degree=n, seed=seed)
        t0 = time.perf_counter()
        sim.simulate_scores(q, docs)
        t_sim = time.perf_counter() - t0

        ctx = CkksContext(CkksParams(n=n, num_limbs=3, num_special=1),
                          seed=seed)
        eng = ColumnPackedRetrieval(ctx, dim=dim, lorentz=False)
        corpus = eng.encrypt_corpus(docs)
        qct = eng.encrypt_query(q)
        eng.decode_scores(eng.scores(corpus, qct), n_docs)  # warm compile
        t0 = time.perf_counter()
        eng.decode_scores(eng.scores(corpus, qct), n_docs)
        t_real = time.perf_counter() - t0
        rows.append({"n": n, "sim_s": t_sim, "real_s": t_real,
                     "speedup": t_real / max(t_sim, 1e-9)})
        if verbose:
            print(f"  N={n}: simulator {t_sim * 1e3:.2f} ms, "
                  f"real {t_real * 1e3:.1f} ms, "
                  f"{rows[-1]['speedup']:.0f}x faster")
    return rows


if __name__ == "__main__":
    run()
