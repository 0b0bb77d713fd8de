"""Pallas fused-NTT prototype vs the jnp reference (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_spear_tpu.core.primes import find_ntt_primes
from fhe_spear_tpu.core.ntt import NttContext
from fhe_spear_tpu.core.ntt_pallas import ntt_pallas


def test_pallas_ntt_matches_reference():
    import functools, jax

    n, l, b = 256, 3, 4
    ctx = NttContext.build(n, find_ntt_primes(n, l))
    rng = np.random.default_rng(0)
    p_np = np.array([q.p for q in ctx.primes], dtype=np.uint64)
    x = rng.integers(0, p_np[None, :, None],
                     size=(b, l, n)).astype(np.uint32)
    ref = functools.partial(jax.jit, static_argnums=0)(
        lambda c, v: c.ntt(v))(ctx, jnp.asarray(x))
    got = ntt_pallas(ctx, jnp.asarray(x), interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
