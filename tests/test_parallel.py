"""Multi-chip sharded BSGS on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from fhe_spear_tpu.ckks import CkksContext, CkksParams
from fhe_spear_tpu.ops.bsgs import bsgs_dims
from fhe_spear_tpu.parallel.sharded_bsgs import ShardedBsgsMatvec


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(CkksParams(n=256, num_limbs=3, num_special=1), seed=41)


def test_sharded_matvec_matches_oracle(ctx):
    d = 64
    assert bsgs_dims(d) == (8, 8)
    devs = jax.devices()
    assert len(devs) == 8, "conftest must force 8 virtual CPU devices"
    mesh = Mesh(np.array(devs), ("giant",))
    eng = ShardedBsgsMatvec(ctx, d, mesh)
    rng = np.random.default_rng(3)
    w = rng.normal(0, 0.3, (d, d))
    x = rng.normal(0, 1, d)
    pt = eng.load(eng.encode(w), ctx.L)
    y = eng(ctx.encrypt_replicated(x), pt)
    assert y.level == ctx.L - 1
    np.testing.assert_allclose(ctx.decrypt_vec(y, d), w @ x, atol=2e-3)


def test_sharded_matches_single_chip(ctx):
    """Sharded and single-chip kernels agree to within keyswitch noise."""
    from fhe_spear_tpu.ops.bsgs import BsgsMatvec

    d = 64
    mesh = Mesh(np.array(jax.devices()), ("giant",))
    sharded = ShardedBsgsMatvec(ctx, d, mesh)
    single = sharded.eng
    rng = np.random.default_rng(4)
    w = rng.normal(0, 0.3, (d, d))
    x = rng.normal(0, 1, d)
    enc = single.encode(w)
    ct = ctx.encrypt_replicated(x)
    y1 = single(ct, single.load(enc, ctx.L))
    y2 = sharded(ct, sharded.load(enc, ctx.L))
    np.testing.assert_allclose(ctx.decrypt_vec(y1, d), ctx.decrypt_vec(y2, d),
                               atol=1e-4)


@pytest.mark.parametrize("num_special", [1, 3])
def test_limb_sharded_rotate_bitwise_exact(num_special):
    """Limb-sharded keyswitch must produce the exact same ciphertext as the
    single-chip path (deterministic arithmetic, no approximation) — for
    both the K=1 fast base conversion and the K>1 CRT mod-down."""
    from fhe_spear_tpu.parallel.limb_sharded import LimbShardedRotator

    ctx = CkksContext(CkksParams(n=256, num_limbs=8,
                                 num_special=num_special),
                      seed=43 + num_special)
    mesh = Mesh(np.array(jax.devices()[:4]), ("limb",))
    ctx.ensure_galois([3])
    rot = LimbShardedRotator(ctx, mesh, level=8)
    rng = np.random.default_rng(5)
    v = rng.uniform(-1, 1, ctx.slots)
    ct = ctx.encrypt(v)
    want = ctx.rotate(ct, 3)
    got = rot.rotate(ct, 3)
    np.testing.assert_array_equal(np.asarray(got.c), np.asarray(want.c))
    np.testing.assert_allclose(ctx.decrypt_vec(got), np.roll(v, -3),
                               atol=1e-4)


def test_sharded_production_token(ctx):
    """The PRODUCTION client-aided protocol with every server projection
    sharded over the mesh: one full FHE token, token-exact vs the
    plaintext oracle (SURVEY.md §2 parallelism mandate)."""
    from fhe_spear_tpu.models.rwkv7 import (make_random_model,
                                            generate_token_plaintext)
    from fhe_spear_tpu.models.client_aided import FheRwkvClient
    from fhe_spear_tpu.parallel.sharded_server import ShardedFheRwkvServer

    model = make_random_model(d=64, f=256, n_blocks=2, head_size=16,
                              vocab=64, seed=3)
    mesh = Mesh(np.array(jax.devices()), ("giant",))
    server = ShardedFheRwkvServer(ctx, model, mesh, level=ctx.L)
    client = FheRwkvClient(ctx, model, server, fused=False)
    state = model.zero_state()
    logits_ref, _ = generate_token_plaintext(model, 5, state)
    logits_fhe, _, _ = client.generate_token(5, state)
    assert int(np.argmax(logits_ref)) == int(np.argmax(logits_fhe))
    corr = float(np.corrcoef(logits_fhe, logits_ref)[0, 1])
    assert corr > 0.999, corr


def test_sharded_bsgs_mxu_backend():
    """Giant-sharded BSGS on the MXU (natural-order) NTT backend — the
    mesh collectives and natural automorphism perms compose."""
    from fhe_spear_tpu.parallel.sharded_bsgs import ShardedBsgsMatvec

    ctx2 = CkksContext(CkksParams(n=256, num_limbs=3, num_special=1,
                                  ntt_backend="mxu"), seed=1)
    d = 64
    mesh = Mesh(np.array(jax.devices()), ("giant",))
    eng = ShardedBsgsMatvec(ctx2, d, mesh)
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.3, (d, d))
    x = rng.normal(0, 1, d)
    y = eng(ctx2.encrypt_replicated(x), eng.load(eng.encode(w), ctx2.L))
    np.testing.assert_allclose(ctx2.decrypt_vec(y, d), w @ x, atol=5e-3)


def test_sharded_fully_encrypted_chain():
    """Fully-encrypted FFN blocks with giant-sharded projections: a 3-block
    chain on the 8-device mesh matches the plaintext oracle at the exact-
    scale-management noise floor (the multi-chip path that removes the
    single-v5e HBM ceiling of the N=16384/L=59 chain, docs/NOTES_r3.md)."""
    from fhe_spear_tpu.models.fully_encrypted import calibrate_magnitude
    from fhe_spear_tpu.parallel.sharded_fully_enc import (
        ShardedFullyEncryptedFfn)

    ctx = CkksContext(CkksParams(n=256, num_limbs=11, num_special=2),
                      seed=47)
    d, f, nb = 64, 128, 3
    mesh = Mesh(np.array(jax.devices()), ("giant",))
    eng = ShardedFullyEncryptedFfn(ctx, d, f, mesh)
    rng = np.random.default_rng(23)
    wk = [rng.normal(0, 0.02, (d, f)) for _ in range(nb)]
    wv = [rng.normal(0, 0.02, (f, d)) for _ in range(nb)]
    x0 = rng.normal(0, 0.1, d)
    wk_c, wv_c = calibrate_magnitude(wk, wv, x0)
    stats, _ = eng.run_chain(wk_c, wv_c, x0)
    assert len(stats) == nb
    assert stats[-1]["level"] == 11 - 9
    for s in stats:
        assert s["corr"] > 0.99999, stats
        assert s["max_err"] < 2e-4, stats


def test_limb_sharded_fully_encrypted_chain_bitwise():
    """VERDICT r3 #3: RNS-limb sharding under the fully-encrypted chain.
    The stored rotation keys and every level's key stack are partitioned
    on the limb axis over an 8-device mesh (CkksContext.shard_eval_keys +
    FullyEncryptedFfn(key_sharding=...)); a 3-block exact-scale chain with
    grouped digits (dnum) runs BITWISE-identically to the single-chip
    kernel — the XLA SPMD partitioner splits the keyswitch contraction
    over limb rows.  This removes the N=16384/L=59 single-chip HBM
    ceiling (docs/NOTES_r3.md postmortem: keys + one level stack alone
    exceed one v5e)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fhe_spear_tpu.models.fully_encrypted import (
        FullyEncryptedFfn, calibrate_magnitude, fe_level_schedule)

    ctx = CkksContext(CkksParams(n=256, num_limbs=14, num_special=3,
                                 dnum=5), seed=56)
    rng = np.random.default_rng(2)
    d, f, nb = 16, 32, 3
    wk = [rng.normal(0, 0.1, (d, f)) for _ in range(nb)]
    wv = [rng.normal(0, 0.1, (f, d)) for _ in range(nb)]
    x0 = rng.normal(0, 0.3, d)
    wk, wv = calibrate_magnitude(wk, wv, x0)
    levels = fe_level_schedule(ctx.L, nb)

    ct0 = ctx.encrypt_replicated(x0)   # ONE encryption shared by both runs
    hosts = None

    def run_chain(eng):
        nonlocal hosts
        if hosts is None:
            hosts = [eng.encode_block(np.asarray(wk[b]), np.asarray(wv[b]),
                                      level=levels[b]) for b in range(nb)]
        ct = ct0
        for b in range(nb):
            ct = eng(ct, eng.load_block(hosts[b], ct.level))
        return ct

    eng1 = FullyEncryptedFfn(ctx, d, f, stage_mode="i32")
    out1 = run_chain(eng1)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("limb",))
    sh = NamedSharding(mesh, P(None, "limb", None))
    ctx.shard_eval_keys(sh)
    eng2 = FullyEncryptedFfn(ctx, d, f, stage_mode="i32", key_sharding=sh)
    out2 = run_chain(eng2)

    assert bool(jax.numpy.array_equal(out1.c, out2.c))  # bitwise
    assert out1.scale == out2.scale and out1.level == out2.level
    # the stacked keys really are limb-partitioned
    stack = eng2.eng._xs(levels[0])[1]
    assert "limb" in str(stack.sharding.spec)
    dec = ctx.decrypt_vec(out2, d)
    ref = np.asarray(x0, dtype=np.float64)
    for b in range(nb):
        ref = ref + (ref @ wk[b]) ** 2 @ wv[b]
    assert float(np.corrcoef(dec, ref)[0, 1]) > 0.999999
