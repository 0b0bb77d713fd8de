"""Factorized special-FFT stages (ckks/dft.py): numerical identity with the
dense slot-evaluation matrix E derived from the encoder, and the collapse
composition law.  Pure host math — no ciphertexts."""

import numpy as np
import pytest

from fhe_spear_tpu.ckks.dft import (special_fft_stages, inverse_stages,
                                    collapse_stages, apply_stages_host,
                                    bitrev)
from fhe_spear_tpu.ckks.encoding import SlotEncoder


def dense_e(n: int) -> np.ndarray:
    """E[j,k] = zeta^(k * 5^j mod 2n): slots of the polynomial with packed
    coefficient vector w (tests claim 1 of ckks/dft.py)."""
    s = n // 2
    two_n = 2 * n
    e = np.ones(s, dtype=np.int64)
    for j in range(1, s):
        e[j] = e[j - 1] * 5 % two_n
    zeta = np.exp(1j * np.pi / n)
    return zeta ** (np.outer(e, np.arange(s)) % two_n)


@pytest.mark.parametrize("n", [16, 64, 256])
def test_forward_stages_equal_dense(n):
    s = n // 2
    m = s.bit_length() - 1
    rng = np.random.default_rng(n)
    w = rng.standard_normal(s) + 1j * rng.standard_normal(s)
    got = apply_stages_host(special_fft_stages(s), w[bitrev(m)])
    np.testing.assert_allclose(got, dense_e(n) @ w, atol=1e-10)


@pytest.mark.parametrize("n", [16, 64, 256])
def test_inverse_stages(n):
    s = n // 2
    m = s.bit_length() - 1
    rng = np.random.default_rng(n + 1)
    z = rng.standard_normal(s) + 1j * rng.standard_normal(s)
    got = apply_stages_host(inverse_stages(s), z)
    want = (np.linalg.solve(dense_e(n), z))[bitrev(m)]
    np.testing.assert_allclose(got, want, atol=1e-10)


@pytest.mark.parametrize("radix", [2, 3, 4])
def test_collapse_preserves_map(radix):
    s = 64
    rng = np.random.default_rng(radix)
    x = rng.standard_normal(s) + 1j * rng.standard_normal(s)
    full = apply_stages_host(special_fft_stages(s), x)
    coll = collapse_stages(special_fft_stages(s), radix, s)
    np.testing.assert_allclose(apply_stages_host(coll, x), full, atol=1e-9)
    # diagonal support bound: 2^(k+1) - 1 per collapsed group
    for g in coll:
        assert len(g) <= 2 ** (radix + 1) - 1


def test_matches_encoder_convention():
    """E w really is the slot vector of the packed coefficient vector under
    the repo encoder (so C2S = stage inverses, no conjugate branch)."""
    n = 64
    s = n // 2
    enc = SlotEncoder(n)
    rng = np.random.default_rng(7)
    a = rng.standard_normal(n)
    z = enc.project(a)                       # slots of coefficient vector a
    w = a[:s] + 1j * a[s:]
    np.testing.assert_allclose(dense_e(n) @ w, z, atol=1e-9)
