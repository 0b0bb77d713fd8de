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
