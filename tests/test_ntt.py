"""NTT/iNTT correctness: round-trip, negacyclic polymul vs schoolbook,
automorphism permutation vs coefficient-domain automorphism."""

import numpy as np
import jax.numpy as jnp
import pytest

from fhe_spear_tpu.core.primes import find_ntt_primes
from fhe_spear_tpu.core.ntt import NttContext, automorphism_perm, coeff_automorphism_np
from fhe_spear_tpu.core.modops import mont_mul
import functools
import jax

# eager dispatch is extremely slow in this environment — jit everything,
# with the context as a static (identity-hashed) argument
_roundtrip = functools.partial(jax.jit, static_argnums=0)(
    lambda ctx, x: ctx.from_mont(ctx.intt(ctx.ntt(ctx.to_mont(x)))))
_fwd = functools.partial(jax.jit, static_argnums=0)(
    lambda ctx, x: ctx.from_mont(ctx.ntt(ctx.to_mont(x))))
_polymul = functools.partial(jax.jit, static_argnums=0)(
    lambda ctx, a, b: ctx.from_mont(ctx.intt(
        mont_mul(ctx.ntt(ctx.to_mont(a)), ctx.ntt(ctx.to_mont(b)), ctx.p, ctx.pinv))))
_auto = functools.partial(jax.jit, static_argnums=(0, 2))(
    lambda ctx, x, perm: ctx.from_mont(ctx.intt(
        jnp.take(ctx.ntt(ctx.to_mont(x)), jnp.asarray(perm), axis=-1))))


def make_ctx(n, L):
    primes = find_ntt_primes(n, L)
    return NttContext.build(n, primes)


@pytest.mark.parametrize("n", [16, 256, 4096])
def test_roundtrip(n):
    ctx = make_ctx(n, 3)
    rng = np.random.default_rng(0)
    p_np = np.array([q.p for q in ctx.primes], dtype=np.uint64)
    x = rng.integers(0, p_np[:, None], size=(3, n)).astype(np.uint32)
    back = np.asarray(_roundtrip(ctx, jnp.asarray(x)))
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("n", [16, 128])
def test_negacyclic_polymul(n):
    ctx = make_ctx(n, 2)
    rng = np.random.default_rng(1)
    a = rng.integers(0, 100, size=n).astype(np.int64)
    b = rng.integers(0, 100, size=n).astype(np.int64)
    # schoolbook negacyclic product
    ref = np.zeros(n, dtype=np.int64)
    for i in range(n):
        for j in range(n):
            k = i + j
            if k < n:
                ref[k] += a[i] * b[j]
            else:
                ref[k - n] -= a[i] * b[j]
    for li, q in enumerate(ctx.primes):
        am = jnp.asarray(np.tile(a % q.p, (len(ctx.primes), 1)).astype(np.uint32))
        bm = jnp.asarray(np.tile(b % q.p, (len(ctx.primes), 1)).astype(np.uint32))
        got = np.asarray(_polymul(ctx, am, bm))[li]
        np.testing.assert_array_equal(got, ref % q.p)


def test_eval_order():
    """Output bin b must hold m(psi^(2*bitrev(b)+1)) — checked by direct evaluation."""
    n = 16
    ctx = make_ctx(n, 1)
    q = ctx.primes[0]
    rng = np.random.default_rng(2)
    a = rng.integers(0, q.p, size=n).astype(np.uint64)
    got = np.asarray(_fwd(ctx, jnp.asarray(a[None, :].astype(np.uint32))))[0]
    from fhe_spear_tpu.core.ntt import _eval_exponents

    e = _eval_exponents(n)
    for b in range(n):
        val = 0
        x = pow(q.root, int(e[b]), q.p)
        for j in range(n - 1, -1, -1):
            val = (val * x + int(a[j])) % q.p
        assert got[b] == val, b


@pytest.mark.parametrize("g", [3, 5, 25, 31])
def test_automorphism(g):
    n = 16
    ctx = make_ctx(n, 2)
    rng = np.random.default_rng(3)
    p_np = np.array([q.p for q in ctx.primes], dtype=np.int64)
    a = rng.integers(0, p_np[:, None], size=(2, n))
    # coefficient-domain automorphism (signed), reduced per limb
    ag = coeff_automorphism_np(a, g) % p_np[:, None]
    perm = tuple(automorphism_perm(n, g).tolist())
    got = _auto(ctx, jnp.asarray(a.astype(np.uint32)), perm)
    np.testing.assert_array_equal(np.asarray(got), ag.astype(np.uint32))


@pytest.mark.parametrize("n", [256, 4096])
def test_shoup_mul_matches_mont(n):
    """shoup_mul (Harvey constant multiplication) is bitwise-equal to
    mont_mul with the Montgomery-form constant.  (The transforms stay on
    mont_mul — measured faster end-to-end on v5e, see core/ntt.py note —
    but the shoup tables/primitive remain available and verified.)"""
    from fhe_spear_tpu.core.modops import shoup_mul, mont_mul

    ctx = make_ctx(n, 4)
    rng = np.random.default_rng(4)
    p_np = np.array([q.p for q in ctx.primes], dtype=np.uint64)
    a = jnp.asarray(rng.integers(0, p_np[:, None],
                                 size=(4, n)).astype(np.uint32))
    f = functools.partial(jax.jit, static_argnums=0)(
        lambda c, v: (shoup_mul(v, c.psi_w, c.psi_ws, c.p),
                      mont_mul(v, c.psi, c.p, c.pinv)))
    got, want = f(ctx, a)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
