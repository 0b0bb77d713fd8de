"""BSGS diagonal matvec vs numpy W @ x (reference oracle strategy:
fhe_matmul_bsgs / fhe_matmul_bsgs_complex, scripts/bootstrap_generation.py)."""

import numpy as np
import pytest

from fhe_spear_tpu.ckks import CkksContext, CkksParams
from fhe_spear_tpu.ops.bsgs import BsgsMatvec, bsgs_dims, extract_diagonals


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(CkksParams(n=256, num_limbs=4, num_special=1), seed=11)


def test_bsgs_dims():
    assert bsgs_dims(2048) == (46, 45)  # 89 rotations, paper/main.tex:1045
    assert bsgs_dims(64) == (8, 8)


def test_extract_diagonals_identity():
    d = 8
    w = np.eye(d)
    diags = extract_diagonals(w)
    G, B = bsgs_dims(d)
    assert diags.shape == (B, G, d)
    np.testing.assert_array_equal(diags[0, 0], np.ones(d))
    assert np.abs(diags).sum() == d  # only main diagonal non-zero


@pytest.mark.parametrize("d", [16, 64, 128])
def test_matvec_real(ctx, d):
    rng = np.random.default_rng(d)
    w = rng.normal(0, 0.3, (d, d))
    x = rng.normal(0, 1, d)
    eng = BsgsMatvec(ctx, d)
    pt = eng.load(eng.encode(w), ctx.L)
    ct = ctx.encrypt_replicated(x)
    y = eng(ct, pt)
    assert y.level == ctx.L - 1
    np.testing.assert_allclose(ctx.decrypt_vec(y, d), w @ x, atol=2e-3)


def test_matvec_complex_pair(ctx):
    d = 64
    rng = np.random.default_rng(99)
    w1 = rng.normal(0, 0.3, (d, d))
    w2 = rng.normal(0, 0.3, (d, d))
    x = rng.normal(0, 1, d)
    eng = BsgsMatvec(ctx, d)
    pt = eng.load(eng.encode(w1 + 1j * w2), ctx.L)
    y = eng(ctx.encrypt_replicated(x), pt)
    z = ctx.decrypt_vec_complex(y, d)
    np.testing.assert_allclose(z.real, w1 @ x, atol=2e-3)
    np.testing.assert_allclose(z.imag, w2 @ x, atol=2e-3)


def test_matvec_chain(ctx):
    """Two chained matvecs: one level each, result = W2 @ (W1 @ x)."""
    d = 32
    rng = np.random.default_rng(5)
    w1 = rng.normal(0, 0.3, (d, d))
    w2 = rng.normal(0, 0.3, (d, d))
    x = rng.normal(0, 1, d)
    eng = BsgsMatvec(ctx, d)
    ct = ctx.encrypt_replicated(x)
    y1 = eng(ct, eng.load(eng.encode(w1), ctx.L))
    y2 = eng(y1, eng.load(eng.encode(w2), ctx.L - 1))
    assert y2.level == ctx.L - 2
    np.testing.assert_allclose(ctx.decrypt_vec(y2, d), w2 @ (w1 @ x), atol=5e-3)


def test_diagonal_matvec_identity_giant_step(ctx):
    """An offset lattice whose giant step is ≡ 0 mod slots maps to Galois
    element 1 (no rotation key exists); the stacked kernel must route it
    through the identity keyswitch key.  Regression: the N=16384
    bootstrap C2S stages hit this (KeyError: 1)."""
    from fhe_spear_tpu.ops.bsgs import DiagonalMatvec

    s = ctx.slots
    offsets = [0, s // 2]                    # unit s//2, G=2 -> step -s ≡ 0
    eng = DiagonalMatvec(ctx, offsets)
    assert any(ctx.galois_element(st) == 1
               for st in eng.giant_steps), eng.giant_steps
    rng = np.random.default_rng(5)
    d0 = rng.normal(0, 0.5, s)
    d1 = rng.normal(0, 0.5, s)
    x = rng.normal(0, 1, s)
    pt = eng.load(eng.encode_table({0: d0, s // 2: d1}), ctx.L)
    y = eng(ctx.encrypt(x), pt)
    want = d0 * x + d1 * np.roll(x, -(s // 2))
    got = ctx.decrypt_vec(y)
    np.testing.assert_allclose(got, want, atol=5e-3)
