"""Calibrate + validate fhesim against the real fhe_spear_tpu backend
(SURVEY.md C16, /root/reference/fhesim/{calibrate,validate}.py — there the
oracle is TenSEAL; here it is this framework's own CKKS).

measure_noise_constant: encrypts random unit vectors, scores them CT-CT
through the column-packed engine, and fits sigma_eps = c * sqrt(d) across
dims.  validate() runs the reference's 4 pass/fail bands
(/root/reference/fhesim/validate.py:73-209):
  1. fitted c within [0.8, 1.2]x of the shipped constant (the
     reference's band; measured over 7 seeds on this backend the fitted
     ratio spans 0.978-1.054, mean 1.014, std 0.032 — docs/NOTES_r5.md)
  2. formula prediction error < 0.10 against measured correlations
  3. simulated vs real top-k overlap >= 6/10
  4. per-context bias std consistent with the shipped bias model
     (measured zero on this backend; see measure_context_bias)
Writes fhesim_calibration.json next to this file when run as a script.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .simulator import FheAccuracySimulator, _normalize

__all__ = ["measure_noise_constant", "measure_context_bias", "validate"]


def _real_scores(ctx, query, docs):
    """Score docs against query under real CT-CT encryption (euclidean)."""
    from ..ops.retrieval import ColumnPackedRetrieval

    eng = ColumnPackedRetrieval(ctx, dim=docs.shape[-1], lorentz=False)
    ct = eng.scores(eng.encrypt_corpus(docs), eng.encrypt_query(query))
    return eng.decode_scores(ct, len(docs))


def measure_noise_constant(ctx, dims=(8, 16, 32, 64), n_docs=64, seed=0):
    """Fit c in sigma_eps = c*sqrt(d) from real encrypted dot products."""
    rng = np.random.default_rng(seed)
    cs = []
    per_dim = {}
    for d in dims:
        docs = _normalize(rng.normal(0, 1, (n_docs, d)))
        q = _normalize(rng.normal(0, 1, d))
        got = _real_scores(ctx, q, docs)
        err = got - docs @ q
        sigma = float(np.std(err))
        per_dim[d] = sigma
        cs.append(sigma / np.sqrt(d))
    return float(np.mean(cs)), per_dim


def measure_context_bias(params, n_contexts=6, n_trials=24, dim=32, seed=0):
    """Per-context systematic score bias (reference validate.py:133-164):
    for each of n_contexts FRESH contexts (fresh secret key + noise),
    average the CT-CT score error over n_trials random pairs; return
    (std of the per-context means, expected sampling std if the true
    bias is zero).  On this backend the measured std is consistent with
    zero — encryption noise and rescale rounding are zero-mean and
    independent of the key — which the shipped BIAS_STD=0 records."""
    from ..ckks import CkksContext

    rng = np.random.default_rng(seed)
    means = []
    sigma_one = None
    for ci in range(n_contexts):
        ctx = CkksContext(params, seed=1000 + ci)
        docs = _normalize(rng.normal(0, 1, (n_trials, dim)))
        q = _normalize(rng.normal(0, 1, dim))
        err = _real_scores(ctx, q, docs) - docs @ q
        means.append(float(np.mean(err)))
        sigma_one = float(np.std(err))
    bias_std = float(np.std(means))
    # sampling floor: even a zero-bias backend shows std(means) of about
    # sigma_eps/sqrt(n_trials)
    floor = (sigma_one or 0.0) / np.sqrt(n_trials)
    return bias_std, floor


def validate(ctx, seed=0, verbose=True):
    """The 4-band validation harness (fhesim/validate.py:73-209 analog)."""
    rng = np.random.default_rng(seed)
    sim = FheAccuracySimulator(poly_modulus_degree=ctx.n, seed=seed)
    results = {}

    # 1. noise constant ratio
    c_meas, per_dim = measure_noise_constant(ctx, seed=seed)
    ratio = c_meas / sim.c
    results["noise_constant"] = {"measured": c_meas, "shipped": sim.c,
                                 "ratio": ratio,
                                 "pass": 0.8 <= ratio <= 1.2}

    # 2. formula error vs measured correlation
    d = 32
    docs = _normalize(rng.normal(0, 1, (96, d)))
    q_idx = 0
    got = _real_scores(ctx, docs[q_idx], docs)
    true = docs @ docs[q_idx]
    rho_real = float(np.corrcoef(got, true)[0, 1])
    rho_pred = sim.rho_noise(float(np.std(true)), d)
    results["formula"] = {"rho_real": rho_real, "rho_pred": rho_pred,
                          "pass": abs(rho_real - rho_pred) < 0.10}

    # 3. sim-vs-real top-k overlap
    k = 10
    sim.c = c_meas
    sim_scores = sim.simulate_scores(docs[q_idx], docs)
    top_real = set(np.argsort(got)[-k:].tolist())
    top_sim = set(np.argsort(sim_scores)[-k:].tolist())
    overlap = len(top_real & top_sim)
    results["topk_overlap"] = {"overlap": overlap, "k": k,
                               "pass": overlap >= 6}

    # 4. context-bias band (reference validate.py:133-164).  The TenSEAL
    # band checks sim_bias_std/real_bias_std in [0.7, 1.3]; this backend
    # models bias as exactly zero, so the band instead verifies the
    # MEASURED per-context bias is statistically indistinguishable from
    # zero (within 3x the n_trials sampling floor).
    bias_std, floor = measure_context_bias(ctx.params, seed=seed)
    results["context_bias"] = {
        "real_bias_std": bias_std, "sampling_floor": floor,
        "sim_bias_std": sim._bias_std,
        "pass": bias_std <= max(3.0 * floor, 1e-9)}

    n_tests = len(results)
    n_pass = sum(r["pass"] for r in results.values())
    results["summary"] = f"{n_pass}/{n_tests} tests passed"
    if verbose:
        for name, r in results.items():
            if isinstance(r, dict):
                print(f"  {name}: {'PASS' if r['pass'] else 'FAIL'} {r}")
    return results


def main():
    from ..ckks import CkksContext, CkksParams

    ctx = CkksContext(CkksParams(n=2048, num_limbs=3, num_special=1), seed=0)
    c, per_dim = measure_noise_constant(ctx)
    res = validate(ctx)
    out = {"noise_constant": c, "per_dim_sigma": per_dim, "n": ctx.n,
           "validation": {k: v for k, v in res.items() if isinstance(v, dict)
                          and all(not isinstance(x, set) for x in v.values())}}
    path = os.path.join(os.path.dirname(__file__), "fhesim_calibration.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2, default=str)
    print(f"wrote {path}: c={c:.3e}")


if __name__ == "__main__":
    main()
