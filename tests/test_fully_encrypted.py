"""Fully-encrypted FFN chain: per-block corr vs plaintext oracle (target
>0.999, reference test_fully_enc_bsgs.py:272-298)."""

import numpy as np
import pytest

from fhe_spear_tpu.ckks import CkksContext, CkksParams
from fhe_spear_tpu.models.fully_encrypted import (
    run_fully_encrypted, plaintext_ffn_block, calibrate_magnitude,
)


@pytest.fixture(scope="module")
def ctx():
    # 8 limbs -> 2 blocks at 3 levels each + margin
    return CkksContext(CkksParams(n=256, num_limbs=8, num_special=1), seed=51)


def test_calibration_bounds_magnitude():
    rng = np.random.default_rng(0)
    d, f, nb = 16, 64, 4
    wk = [rng.normal(0, 0.02, (d, f)) for _ in range(nb)]
    wv = [rng.normal(0, 0.02, (f, d)) for _ in range(nb)]
    x0 = rng.normal(0, 0.1, d)
    wk_c, wv_c = calibrate_magnitude(wk, wv, x0)
    x = x0.copy()
    for k, v in zip(wk_c, wv_c):
        x = plaintext_ffn_block(x, k, v)
        assert np.max(np.abs(x)) < 3.0
        assert max(np.abs(m).max() for m in (k, v)) < 50


def test_two_blocks_match_oracle(ctx):
    rng = np.random.default_rng(7)
    d, f, nb = 32, 128, 2
    wk = [rng.normal(0, 0.02, (d, f)) for _ in range(nb)]
    wv = [rng.normal(0, 0.02, (f, d)) for _ in range(nb)]
    x0 = rng.normal(0, 0.1, d)
    stats = run_fully_encrypted(ctx, wk, wv, x0, verbose=False)
    assert len(stats) == 2
    for s in stats:
        assert s["corr"] > 0.999, stats
        assert s["max_err"] < 1e-2, stats
    assert stats[-1]["level"] == ctx.L - 6


def test_full_vocab_token_and_seq_chunks(ctx):
    """Full-vocab head over the encrypted trunk: token + logits match the
    plaintext chain; lax.map chunking (seq_chunks) agrees with vmap."""
    from fhe_spear_tpu.models.fully_encrypted import (
        generate_fully_encrypted_token, full_vocab_head)

    rng = np.random.default_rng(13)
    d, f, nb, vocab = 32, 128, 2, 1000
    wk = [rng.normal(0, 0.02, (d, f)) for _ in range(nb)]
    wv = [rng.normal(0, 0.02, (f, d)) for _ in range(nb)]
    w_head = rng.normal(0, 1 / np.sqrt(d), (d, vocab))
    x0 = rng.normal(0, 0.1, d)

    wk_c, wv_c = calibrate_magnitude(wk, wv, x0)
    x_ref = x0.copy()
    for k, v in zip(wk_c, wv_c):
        x_ref = plaintext_ffn_block(x_ref, k, v)
    want_tok, want_logits = full_vocab_head(x_ref, w_head)

    for seq in (False, True):
        tok, logits, stats = generate_fully_encrypted_token(
            ctx, wk, wv, w_head, x0, seq_chunks=seq)
        assert len(stats) == nb and stats[-1]["corr"] > 0.999
        assert tok == want_tok, (seq, tok, want_tok)
        corr = np.corrcoef(logits, want_logits)[0, 1]
        assert corr > 0.999, (seq, corr)


def test_deep_chain_i32_dnum():
    """The production deep-chain configuration in miniature: i32 staging
    (per-giant-group in-kernel RNS expansion), dnum-grouped keyswitch,
    pre-encoded blocks — the exact path bench_fully_enc.py runs at
    D=2048/F=8192/19 blocks."""
    from fhe_spear_tpu.models.fully_encrypted import (
        FullyEncryptedFfn, pre_encode_blocks)

    ctx = CkksContext(CkksParams(n=256, num_limbs=11, num_special=3,
                                 dnum=4), seed=53)
    rng = np.random.default_rng(17)
    d, f, nb = 16, 64, 3
    wk = [rng.normal(0, 0.02, (d, f)) for _ in range(nb)]
    wv = [rng.normal(0, 0.02, (f, d)) for _ in range(nb)]
    x0 = rng.normal(0, 0.1, d)
    wk_c, wv_c = calibrate_magnitude(wk, wv, x0)
    eng = FullyEncryptedFfn(ctx, d, f, seq_chunks=True, stage_mode="i32")
    from fhe_spear_tpu.models.fully_encrypted import fe_level_schedule
    levels = fe_level_schedule(ctx.L, nb)
    assert levels == [11, 8, 5]
    hosts = pre_encode_blocks(eng, wk_c, wv_c, levels=levels)
    stats = run_fully_encrypted(ctx, wk_c, wv_c, x0, pre_encoded=hosts,
                                eng=eng, calibrated=True, verbose=False)
    assert len(stats) == nb
    for s in stats:
        # exact scale management: absolute CKKS noise only (the legacy
        # level-agnostic encodes relabel ~3e-2 of signal per block)
        assert s["corr"] > 0.99999, stats
        assert s["max_err"] < 1e-4, stats

    # mis-leveled pre-encodes self-correct (re-encode-on-mismatch)
    hosts_bad = pre_encode_blocks(eng, wk_c, wv_c, levels=[11, 9, 5])
    stats2 = run_fully_encrypted(ctx, wk_c, wv_c, x0, pre_encoded=hosts_bad,
                                 eng=eng, calibrated=True, verbose=False)
    assert hosts_bad[1]["level"] == 8
    for s in stats2:
        assert s["max_err"] < 1e-4, stats2


def test_timemix_block():
    from fhe_spear_tpu.models.fully_encrypted import FullyEncryptedTimeMix

    ctx = CkksContext(CkksParams(n=256, num_limbs=6, num_special=1), seed=52)
    rng = np.random.default_rng(11)
    d = 32
    w = [rng.normal(0, 1 / np.sqrt(d), (d, d)) for _ in range(4)]
    x = rng.normal(0, 0.5, d)
    eng = FullyEncryptedTimeMix(ctx, d)
    ct = ctx.encrypt_replicated(x)
    out = eng(ct, eng.encode_block(*w))
    want = eng.oracle(x, *w)
    got = ctx.decrypt_vec(out, d)
    corr = np.corrcoef(got, want)[0, 1]
    assert corr > 0.999, corr
    np.testing.assert_allclose(got, want, atol=5e-3)

    # exact scale management (level-aware encodes): absolute noise only
    out_e = eng(ct, eng.encode_block(*w, level=ct.level))
    got_e = ctx.decrypt_vec(out_e, d)
    np.testing.assert_allclose(got_e, want, atol=2e-4)


def test_width2_composite_scale_chain():
    """VERDICT r4 #4: the width-2 chain runs at Delta_2 ~ 2^56 (6
    limbs/block, two-plane int64-split staging, 3-limb CRT decrypt) and
    drops the absolute-error floor by ~2^28 — the reference-precision
    mode (reference: max_err 9.3e-9 over 19 blocks on 59-bit primes,
    paper/main.tex:1130)."""
    from fhe_spear_tpu.models.fully_encrypted import (
        FullyEncryptedFfn, pre_encode_blocks, fe_level_schedule)

    d, f, blocks = 32, 64, 2
    rng = np.random.default_rng(42)
    w_keys = [rng.standard_normal((d, f)) / np.sqrt(d) for _ in range(blocks)]
    w_vals = [rng.standard_normal((f, d)) / np.sqrt(f) for _ in range(blocks)]
    x0 = np.random.default_rng(4242).uniform(-1, 1, d)
    wk, wv = calibrate_magnitude(w_keys, w_vals, x0)

    ctx = CkksContext(CkksParams(n=512, num_limbs=15, num_special=2), seed=0)
    eng = FullyEncryptedFfn(ctx, d, f, stage_mode="i32", width=2)
    levels = fe_level_schedule(15, blocks, width=2)
    assert levels == [15, 9]
    hosts = pre_encode_blocks(eng, wk, wv, levels=levels)
    stats = run_fully_encrypted(ctx, wk, wv, x0, pre_encoded=hosts,
                                eng=eng, calibrated=True, verbose=False)
    assert len(stats) == blocks
    for s in stats:
        # width-1 at this config floors at ~3e-6; width 2 reaches ~2e-14
        assert s["max_err"] < 1e-10, stats
        assert s["corr"] > 0.9999999999, stats
    assert stats[-1]["level"] == 3  # 3-limb decrypt keeps its limbs


def test_wide_staging_roundtrip():
    """encode_wide + rns_expand_wide == the direct expanded encode of the
    same diagonals at the same composite scale (bitwise residues)."""
    import jax.numpy as jnp

    from fhe_spear_tpu.ops.bsgs import BsgsMatvec, rns_expand_wide

    ctx = CkksContext(CkksParams(n=256, num_limbs=6, num_special=1), seed=7)
    rng = np.random.default_rng(3)
    d = 16
    w = rng.standard_normal((d, d))
    eng = BsgsMatvec(ctx, d)
    scale = float(ctx.q_np[5]) * float(ctx.q_np[4])      # composite ~2^56
    enc = eng.encode_wide(w, scale)
    got = np.asarray(rns_expand_wide(ctx, jnp.asarray(enc.coeffs), 6))

    # oracle: host-side int64 reduce of the same coefficients
    from fhe_spear_tpu.ops.bsgs import extract_diagonals
    diags = extract_diagonals(w, d)
    tiled = np.tile(diags, (1, 1, ctx.slots // d))
    coeffs = np.round(ctx.encoder.embed(tiled) * scale).astype(np.int64)
    res = ctx._reduce_rows(coeffs, tuple(range(6)))
    want = np.asarray(ctx._j_to_eval_mont(tuple(range(6)))(res))
    np.testing.assert_array_equal(got, want)
