"""CKKS bootstrap: stage-wise oracles then the full refresh
(reference oracle: bootstrap_spot_check, scripts/bootstrap_generation.py
:1035-1077 — round-trip error < 0.1)."""

import numpy as np
import pytest

from fhe_spear_tpu.ckks import CkksContext, CkksParams
from fhe_spear_tpu.ckks.bootstrap import Bootstrapper


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(
        CkksParams(n=128, num_limbs=20, num_special=2,
                   secret_hamming_weight=16), seed=81)


@pytest.fixture(scope="module")
def bt(ctx):
    return Bootstrapper(ctx, exp_degree=23, radix=None)   # dense linear maps


@pytest.fixture(scope="module")
def btf(ctx):
    return Bootstrapper(ctx, exp_degree=23, radix=3)      # factorized FFT


def rand_msg(ctx, seed=0, mag=0.8):
    rng = np.random.default_rng(seed)
    return rng.uniform(-mag, mag, ctx.slots)


def test_mod_raise(ctx, bt):
    m = rand_msg(ctx, 1)
    ct = ctx.mod_switch_to(ctx.encrypt(m, scale=bt.delta_d), 1)
    want_coeffs = ctx.encoder.encode(np.asarray(m, complex), bt.delta_d)
    raised = bt.mod_raise(ct)
    assert raised.level == ctx.L
    got = ctx.decrypt_to_coeffs(raised)            # exact (2-limb CRT)
    q0 = int(ctx.q_np[0])
    I = (got - want_coeffs) / q0
    np.testing.assert_allclose(I, np.round(I), atol=1e-3)  # integer multiple
    assert np.abs(I).max() <= bt.K, np.abs(I).max()


def test_c2s_extracts_coefficients(ctx, bt):
    m = rand_msg(ctx, 2)
    ct = ctx.encrypt(m)                            # full level, scale Delta
    w = bt._pair_matvec(bt._c2s, ct)
    got = ctx.decrypt_vec_complex(w)
    coeffs = ctx.encoder.encode(np.asarray(m, complex), ctx.scale) / ctx.scale
    s = ctx.slots
    want = coeffs[:s] + 1j * coeffs[s:]
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_s2c_inverts_c2s(ctx, bt):
    m = rand_msg(ctx, 3)
    ct = ctx.encrypt(m)
    w = bt._pair_matvec(bt._c2s, ct)
    back = bt._pair_matvec(bt._s2c, w)
    np.testing.assert_allclose(ctx.decrypt_vec(back), m, atol=1e-2)


def test_c2s_factorized_matches_dense(ctx, bt, btf):
    """Factorized CoeffToSlot = dense CoeffToSlot up to the dropped
    bit-reversal permutation (ckks/dft.py)."""
    from fhe_spear_tpu.ckks.dft import bitrev

    m = rand_msg(ctx, 12)
    ct = ctx.encrypt(m)
    dense = ctx.decrypt_vec_complex(bt._pair_matvec(bt._c2s, ct))
    fact = ctx.decrypt_vec_complex(btf._coeff_to_slot(ct))
    br = bitrev(ctx.slots.bit_length() - 1)
    np.testing.assert_allclose(fact, dense[br], atol=2e-3)


def test_s2c_factorized_inverts(ctx, btf):
    m = rand_msg(ctx, 13)
    ct = ctx.encrypt(m)
    w = btf._coeff_to_slot(ct)
    back = btf._slot_to_coeff(w)
    np.testing.assert_allclose(ctx.decrypt_vec(back), m, atol=1e-2)


def test_full_bootstrap_wide():
    """width=2 (composite-scale) EvalMod + wide C2S: the production-ring
    configuration.  Refresh error drops ~3 orders of magnitude vs
    width=1 (the 28-bit noise floor x gamma x sqrt(S) amplification —
    tools/diag_bootstrap.py)."""
    ctx = CkksContext(
        CkksParams(n=128, num_limbs=34, num_special=4,
                   secret_hamming_weight=16, dnum=12), seed=82)
    bt = Bootstrapper(ctx, exp_degree=23, radix=3, evalmod_width=2)
    rng = np.random.default_rng(9)
    m = rng.uniform(-0.8, 0.8, ctx.slots)
    ct = ctx.mod_switch_to(ctx.encrypt(m), 2)
    out = bt.bootstrap(ct)
    assert out.level >= 3, out.level
    got = ctx.decrypt_vec(out)
    err = np.abs(got - m).max()
    assert err < 5e-4, err
    corr = np.corrcoef(got, m)[0, 1]
    assert corr > 0.9999999, corr


def test_full_bootstrap_factorized(ctx, btf):
    m = rand_msg(ctx, 14)
    ct = ctx.mod_switch_to(ctx.encrypt(m), 2)
    out = btf.bootstrap(ct)
    assert out.level >= 3, out.level
    got = ctx.decrypt_vec(out)
    err = np.abs(got - m).max()
    assert err < 0.05, err
    corr = np.corrcoef(got, m)[0, 1]
    assert corr > 0.999, corr


def test_eval_exp(ctx, bt):
    rng = np.random.default_rng(4)
    lim = bt.exp_range[1]
    t = rng.uniform(-0.7 * lim, 0.7 * lim, ctx.slots)
    # slot magnitudes ~lim exceed the encoder's coefficient bound; encrypt
    # scaled down and multiply back up homomorphically (the real pipeline
    # only ever produces such values homomorphically, post-ModRaise)
    up = 2048.0
    ct = ctx.rescale(ctx.mul_scalar(ctx.encrypt(t / up), up))
    e = bt._eval_exp(ct)
    want = np.exp(2j * np.pi * t * bt.delta_d / bt.q0)
    got = ctx.decrypt_vec_complex(e)
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_full_bootstrap(ctx, bt):
    m = rand_msg(ctx, 5)
    ct = ctx.mod_switch_to(ctx.encrypt(m), 2)      # depleted ciphertext
    out = bt.bootstrap(ct)
    assert out.level >= 3, out.level
    got = ctx.decrypt_vec(out)
    err = np.abs(got - m).max()
    assert err < 0.05, err                          # ref band: < 0.1
    corr = np.corrcoef(got, m)[0, 1]
    assert corr > 0.999, corr


def test_fully_encrypted_chain_with_bootstrap():
    """Blocks past modulus depletion: refresh mid-chain, stay correlated
    (the reference's bootstrap-when-depleted loop,
    test_fully_enc_bsgs.py:238-267).  26 limbs run 8 blocks (3 levels
    each), bootstrap refreshes to ~8 limbs, then one more block runs."""
    from fhe_spear_tpu.ckks.bootstrap import Bootstrapper
    from fhe_spear_tpu.models.fully_encrypted import run_fully_encrypted

    ctx2 = CkksContext(
        CkksParams(n=128, num_limbs=26, num_special=2,
                   secret_hamming_weight=16), seed=82)
    bt2 = Bootstrapper(ctx2, exp_degree=23)
    rng = np.random.default_rng(9)
    d, f, nb = 16, 32, 9
    wk = [rng.normal(0, 0.1, (d, f)) for _ in range(nb)]
    wv = [rng.normal(0, 0.1, (f, d)) for _ in range(nb)]
    x0 = rng.normal(0, 0.3, d)
    stats = run_fully_encrypted(ctx2, wk, wv, x0, bootstrap_fn=bt2.bootstrap,
                                min_levels=4, verbose=False)
    assert len(stats) == nb, [s["block"] for s in stats]
    assert stats[-1]["bootstraps"] >= 1
    for s in stats:
        assert s["corr"] > 0.98, stats


def test_bootstrapped_exact_scale_chain(tmp_path):
    """Exact scale management THROUGH a bootstrap (ADVICE r3 #1): blocks
    pre-encoded at per-level prime scales, mid-chain refresh normalized
    exactly to ctx.scale, post-bootstrap blocks stay on the exact-scale
    invariant (no retag deviation compounding through CT-CT squares).
    Also covers ADVICE r3 #2: off-schedule re-encodes are persisted to
    the cache dir and reloaded by a later pass instead of re-paying the
    host encode."""
    from fhe_spear_tpu.models.fully_encrypted import (
        FullyEncryptedFfn, calibrate_magnitude, run_fully_encrypted,
        pre_encode_blocks, fe_level_schedule)

    ctx2 = CkksContext(
        CkksParams(n=128, num_limbs=26, num_special=2,
                   secret_hamming_weight=16), seed=82)
    bt2 = Bootstrapper(ctx2, exp_degree=23)
    rng = np.random.default_rng(10)
    d, f, nb = 16, 32, 9
    wk = [rng.normal(0, 0.1, (d, f)) for _ in range(nb)]
    wv = [rng.normal(0, 0.1, (f, d)) for _ in range(nb)]
    x0 = rng.normal(0, 0.3, d)
    wk, wv = calibrate_magnitude(wk, wv, x0)
    eng = FullyEncryptedFfn(ctx2, d, f)
    # boot_level=8 is a guess; a wrong guess exercises the re-encode +
    # persist path and pass 2 still hits steady state from disk
    levels = fe_level_schedule(ctx2.L, nb, boot_level=8)
    cache = str(tmp_path)
    hosts = pre_encode_blocks(eng, wk, wv, cache_dir=cache, levels=levels)
    stats = run_fully_encrypted(
        ctx2, wk, wv, x0, bootstrap_fn=bt2.bootstrap, pre_encoded=hosts,
        eng=eng, calibrated=True, verbose=False, cache_dir=cache)
    assert len(stats) == nb, [s["block"] for s in stats]
    assert stats[-1]["bootstraps"] >= 1
    for s in stats:
        if s["bootstraps"] == 0:
            # pre-bootstrap: exact scales, no relabel — near-exact blocks
            assert s["corr"] > 0.999999, stats
        else:
            # post-bootstrap: refresh noise dominates, but no compounding
            assert s["corr"] > 0.98, stats
    # pass 2: every block (incl. any re-encoded one, now persisted) loads
    # from cache — same numerics, no re-encode message needed
    msgs = []
    stats2 = run_fully_encrypted(
        ctx2, wk, wv, x0, bootstrap_fn=bt2.bootstrap, pre_encoded=hosts,
        eng=eng, calibrated=True, verbose=False, cache_dir=cache,
        log_fn=msgs.append)
    assert len(stats2) == nb
    assert not any("re-encode" in m for m in msgs), msgs


@pytest.mark.slow
def test_bootstrap_mxu_backend():
    """The full refresh on the MXU (four-step, natural-order) NTT backend:
    ModRaise, factorized C2S/S2C, EvalMod, and every rotation run through
    the systolic transform path."""
    ctx2 = CkksContext(
        CkksParams(n=128, num_limbs=20, num_special=2,
                   secret_hamming_weight=16, ntt_backend="mxu"), seed=81)
    bt2 = Bootstrapper(ctx2, exp_degree=23, radix=3)
    rng = np.random.default_rng(1)
    m = rng.uniform(-0.8, 0.8, ctx2.slots)
    out = bt2.bootstrap(ctx2.mod_switch_to(ctx2.encrypt(m), 2))
    got = ctx2.decrypt_vec(out)
    assert float(np.abs(got - m).max()) < 5e-3
    assert float(np.corrcoef(got, m)[0, 1]) > 0.9999
