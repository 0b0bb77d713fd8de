"""Pallas fused NTT/iNTT vs the jnp Stockham reference (interpret mode),
plus the full-engine PallasBackend integration."""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_spear_tpu.core.primes import find_ntt_primes
from fhe_spear_tpu.core.ntt import NttContext
from fhe_spear_tpu.core.ntt_pallas import ntt_pallas, intt_pallas


def _rand_residues(ctx, l, b, n, seed=0):
    rng = np.random.default_rng(seed)
    p_np = np.array([q.p for q in ctx.primes[:l]], dtype=np.uint64)
    return rng.integers(0, p_np[:, None, None],
                        size=(l, b, n)).astype(np.uint32)


def test_pallas_ntt_bitwise_and_roundtrip():
    import functools, jax

    n, l, b = 256, 3, 4
    ctx = NttContext.build(n, find_ntt_primes(n, l))
    x = jnp.asarray(_rand_residues(ctx, l, b, n))      # [R, B, N]
    ref = functools.partial(jax.jit, static_argnums=0)(
        lambda c, v: c.ntt(v))(ctx, jnp.swapaxes(x, 0, 1))
    got = ntt_pallas(ctx, x, interpret=True)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(jnp.swapaxes(ref, 0, 1)))
    back = intt_pallas(ctx, got, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_pallas_ntt_row_subset():
    n, l = 256, 4
    ctx = NttContext.build(n, find_ntt_primes(n, l))
    rows = (0, 2)
    x = jnp.asarray(_rand_residues(ctx, l, 2, n)[list(rows)])
    ref = ctx.ntt(jnp.swapaxes(x, 0, 1), rows)
    got = ntt_pallas(ctx, x, rows=rows, interpret=True)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(jnp.swapaxes(ref, 0, 1)))


def test_pallas_backend_engine():
    """CkksContext on ntt_backend='pallas' is bitwise-compatible with the
    Stockham engine: encrypt on one, operate, decrypt on the other."""
    from fhe_spear_tpu.ckks import CkksContext, CkksParams

    params = dict(n=128, num_limbs=3, num_special=1)
    ctx_p = CkksContext(CkksParams(ntt_backend="pallas", **params), seed=7)
    rng = np.random.default_rng(1)
    m = rng.uniform(-1, 1, ctx_p.slots)
    ct = ctx_p.encrypt(m)
    got = ctx_p.decrypt_vec(ct)
    assert np.abs(got - m).max() < 1e-4
    # one rotation through the pallas keyswitch path
    ctx_p.ensure_galois([1])
    rot = ctx_p.rotate(ct, 1)
    np.testing.assert_allclose(ctx_p.decrypt_vec(rot), np.roll(m, -1),
                               atol=1e-3)
