"""fhesim: formula sanity + calibration/validation against the real backend."""

import numpy as np
import pytest

from fhe_spear_tpu.fhesim import FheAccuracySimulator
from fhe_spear_tpu.fhesim.calibrate import measure_noise_constant, validate
from fhe_spear_tpu.ckks import CkksContext, CkksParams


def test_predict_shapes_and_monotonicity():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (200, 128))
    sim = FheAccuracySimulator(poly_modulus_degree=8192, seed=1)
    r64 = sim.predict(x, target_dim=64)
    assert 0.9 < r64.predicted_correlation <= 1.0
    # much noisier backend -> lower predicted correlation
    noisy = FheAccuracySimulator(noise_constant=0.05, seed=1)
    assert noisy.predict(x, target_dim=64).predicted_correlation \
        < r64.predicted_correlation


def test_simulate_retrieval_precision():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (100, 32))
    sim = FheAccuracySimulator(poly_modulus_degree=8192, seed=2)
    acc = sim.estimate_retrieval_accuracy(x, n_queries=20, k=5, n_runs=2)
    assert acc["precision_at_k"] > 0.95  # tiny noise constant -> near exact


def test_calibrate_inverts_formula():
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (300, 128))
    sim = FheAccuracySimulator(noise_constant=1e-3, seed=3)
    # build synthetic "measured" correlations from a known c
    c_true = 0.004
    _, _, vt = np.linalg.svd(x / np.linalg.norm(x, axis=1, keepdims=True),
                             full_matrices=False)
    meas = {}
    for d in (16, 32, 64):
        z = x @ vt[:d].T
        z = z / np.linalg.norm(z, axis=1, keepdims=True)
        i, j = rng.integers(0, 300, 800), rng.integers(0, 300, 800)
        sims = np.einsum("ij,ij->i", z[i], z[j])
        s = float(np.std(sims))
        meas[d] = s / np.sqrt(s**2 + c_true**2 * d)
    got = sim.calibrate(x, meas)
    assert abs(got - c_true) / c_true < 0.25


@pytest.mark.slow
def test_validate_against_real_backend():
    ctx = CkksContext(CkksParams(n=256, num_limbs=3, num_special=1), seed=61)
    c, per_dim = measure_noise_constant(ctx, dims=(8, 16), n_docs=32)
    assert 0 < c < 1e-3  # tiny noise at scale 2^28
    res = validate(ctx, verbose=False)
    assert res["formula"]["pass"]
    assert res["topk_overlap"]["pass"]
