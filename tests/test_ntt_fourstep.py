"""Four-step (matmul-form) NTT: bitwise equality with the production
Stockham NTT, single-device and sharded with one all-to-all."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from fhe_spear_tpu.ckks import CkksContext, CkksParams
from fhe_spear_tpu.parallel.ntt_fourstep import FourStepNtt


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(CkksParams(n=256, num_limbs=3, num_special=1), seed=17)


def rand_mont(ctx, rows, seed=0):
    rng = np.random.default_rng(seed)
    q = ctx.q_np[list(rows)]
    return jnp.asarray(
        rng.integers(0, q[:, None], (len(rows), ctx.n)).astype(np.uint32))


@pytest.mark.parametrize("n1,n2", [(16, 16), (8, 32)])
def test_fourstep_matches_stockham_bitwise(ctx, n1, n2):
    fs = FourStepNtt(ctx.ntt, n1, n2)
    rows = (0, 1, 2)
    x = rand_mont(ctx, rows, seed=n1)
    want = np.asarray(ctx.ntt.ntt(x, rows))
    got = np.asarray(fs.ntt_stockham_order(x, rows))
    np.testing.assert_array_equal(got, want)


def test_fourstep_sharded_one_all_to_all(ctx):
    """j2-sharded input -> ONE all-to-all -> k1-sharded output; assembled
    result bitwise-equal to the single-device four-step AND (after the
    bitrev permutation) to the production Stockham NTT."""
    devs = jax.devices()
    assert len(devs) == 8
    mesh = Mesh(np.array(devs), ("coeff",))
    fs = FourStepNtt(ctx.ntt, 16, 16)
    rows = (0, 1, 2)
    x = rand_mont(ctx, rows, seed=5)
    got = np.asarray(fs.ntt_sharded(x, mesh, "coeff", rows))
    single = np.asarray(fs.ntt(x, rows))
    np.testing.assert_array_equal(got, single)
    want = np.asarray(ctx.ntt.ntt(x, rows))
    from fhe_spear_tpu.core.ntt import bitrev_indices

    np.testing.assert_array_equal(got[..., bitrev_indices(ctx.n)], want)


@pytest.mark.parametrize("n1,n2", [(16, 16), (8, 32)])
def test_fourstep_mxu_bitwise(ctx, n1, n2):
    """int8-limb MXU contraction bitwise-equal to the mont_mul-tree path
    (and hence to the Stockham NTT after bitrev)."""
    fs = FourStepNtt(ctx.ntt, n1, n2)
    rows = (0, 1, 2)
    x = rand_mont(ctx, rows, seed=100 + n1)
    want = np.asarray(fs.ntt(x, rows))
    got = np.asarray(jax.jit(lambda v: fs.ntt_mxu(v, rows))(x))
    np.testing.assert_array_equal(got, want)


def test_fourstep_mxu_roundtrip(ctx):
    """intt_mxu inverts ntt_mxu bitwise (Montgomery-exact roundtrip)."""
    fs = FourStepNtt(ctx.ntt, 16, 16)
    rows = (0, 1, 2)
    x = rand_mont(ctx, rows, seed=7)
    fwd = jax.jit(lambda v: fs.ntt_mxu(v, rows))
    inv = jax.jit(lambda v: fs.intt_mxu(v, rows))
    np.testing.assert_array_equal(np.asarray(inv(fwd(x))), np.asarray(x))


def test_mxu_backend_context_ops():
    """A full CkksContext on the MXU (natural-order) NTT backend:
    encrypt/decrypt, multiply+relin+rescale, rotate, conjugate, and a BSGS
    matvec all agree with plaintext math (functional equivalence with the
    Stockham backend; bin orders differ by design)."""
    from fhe_spear_tpu.ops.bsgs import BsgsMatvec

    ctx = CkksContext(CkksParams(n=256, num_limbs=4, num_special=1,
                                 ntt_backend="mxu"), seed=5)
    rng = np.random.default_rng(3)
    v = rng.normal(0, 0.5, ctx.slots)
    w = rng.normal(0, 0.5, ctx.slots)
    ct, cw = ctx.encrypt(v), ctx.encrypt(w)
    np.testing.assert_allclose(ctx.decrypt_vec(ct), v, atol=1e-4)
    m = ctx.rescale(ctx.multiply(ct, cw))
    np.testing.assert_allclose(ctx.decrypt_vec(m), v * w, atol=1e-3)
    ctx.ensure_galois([5], conj=True)
    r = ctx.rotate(ct, 5)
    np.testing.assert_allclose(ctx.decrypt_vec(r), np.roll(v, -5), atol=1e-4)
    cj = ctx.conjugate(ctx.encrypt(v))
    np.testing.assert_allclose(ctx.decrypt_vec(cj), v, atol=1e-4)

    d = 16
    eng = BsgsMatvec(ctx, d)
    W = rng.normal(0, 0.4, (d, d))
    x = rng.normal(0, 0.7, d)
    pt = eng.load(eng.encode(W), ctx.L)
    y = eng(ctx.encrypt_replicated(x), pt)
    got = ctx.decrypt_vec(y, d)
    np.testing.assert_allclose(got, W @ x, atol=5e-3)


@pytest.mark.parametrize("dot_impl", ["f32", "int8"])
@pytest.mark.parametrize("variant", ["3d", "2d", "2dio"])
def test_fourstep_pallas_bitwise(ctx, dot_impl, variant):
    """Fused Pallas four-step kernel (interpret mode) bitwise-equal to the
    XLA MXU path; the 2d variant is the Mosaic-friendly body (2-D matmuls
    and 2-D transposes only)."""
    from fhe_spear_tpu.core.fourstep_pallas import ntt_fourstep_pallas

    fs = FourStepNtt(ctx.ntt, 16, 16)
    rows = (0, 1, 2)
    x = rand_mont(ctx, rows, seed=42).reshape(3, 1, ctx.n)
    x = jnp.concatenate([x, rand_mont(ctx, rows, seed=43
                                      ).reshape(3, 1, ctx.n)], axis=1)
    want = np.asarray(fs.ntt_mxu_b(x, rows))
    got = np.asarray(ntt_fourstep_pallas(fs, x, rows, dot_impl=dot_impl,
                                         interpret=True, variant=variant))
    np.testing.assert_array_equal(got, want)
