"""CKKS correctness: encrypt/decrypt round-trip, homomorphic ops vs numpy
plaintext oracle (the reference's test strategy, SURVEY.md §4)."""

import numpy as np
import pytest

from fhe_spear_tpu.ckks import CkksContext, CkksParams


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(CkksParams(n=256, num_limbs=4, num_special=1), seed=7)


@pytest.fixture(scope="module")
def ctx3():
    return CkksContext(CkksParams(n=256, num_limbs=4, num_special=3), seed=8)


def rand_vec(ctx, seed=0, mag=1.0, cplx=False):
    rng = np.random.default_rng(seed)
    v = rng.uniform(-mag, mag, ctx.slots)
    if cplx:
        v = v + 1j * rng.uniform(-mag, mag, ctx.slots)
    return v


def test_encode_decode(ctx):
    v = rand_vec(ctx, 0, cplx=True)
    pt = ctx.encoder.encode(v, ctx.scale)
    back = ctx.encoder.decode(pt, ctx.scale)
    np.testing.assert_allclose(back, v, atol=1e-6)


def test_encrypt_decrypt(ctx):
    v = rand_vec(ctx, 1, cplx=True)
    ct = ctx.encrypt(v)
    got = ctx.decrypt_vec_complex(ct)
    np.testing.assert_allclose(got, v, atol=1e-5)


def test_add_sub_negate(ctx):
    a, b = rand_vec(ctx, 2), rand_vec(ctx, 3)
    ca, cb = ctx.encrypt(a), ctx.encrypt(b)
    np.testing.assert_allclose(ctx.decrypt_vec(ctx.add(ca, cb)), a + b, atol=1e-5)
    np.testing.assert_allclose(ctx.decrypt_vec(ctx.sub(ca, cb)), a - b, atol=1e-5)
    np.testing.assert_allclose(ctx.decrypt_vec(ctx.negate(ca)), -a, atol=1e-5)


def test_add_mul_plain_rescale(ctx):
    a, b = rand_vec(ctx, 4), rand_vec(ctx, 5)
    ca = ctx.encrypt(a)
    pb = ctx.encode(b)
    np.testing.assert_allclose(ctx.decrypt_vec(ctx.add_plain(ca, pb)), a + b,
                               atol=1e-5)
    prod = ctx.rescale(ctx.mul_plain(ca, pb))
    assert prod.level == ctx.L - 1
    assert abs(prod.scale / ctx.scale - 1.0) < 0.1  # scale drift stays small
    np.testing.assert_allclose(ctx.decrypt_vec(prod), a * b, atol=1e-4)


def test_ct_ct_multiply(ctx):
    a = rand_vec(ctx, 6, cplx=True)
    b = rand_vec(ctx, 7, cplx=True)
    ca, cb = ctx.encrypt(a), ctx.encrypt(b)
    prod = ctx.rescale(ctx.multiply(ca, cb))
    np.testing.assert_allclose(ctx.decrypt_vec_complex(prod), a * b, atol=1e-4)


def test_square_chain_depth(ctx):
    a = rand_vec(ctx, 8, mag=0.9)
    ct = ctx.encrypt(a)
    for _ in range(ctx.L - 1):
        ct = ctx.rescale(ctx.square(ct))
        a = a * a
    assert ct.level == 1
    np.testing.assert_allclose(ctx.decrypt_vec(ct), a, atol=1e-3)


def test_mod_drop(ctx):
    a = rand_vec(ctx, 9)
    ct = ctx.mod_drop(ctx.encrypt(a), 2)
    assert ct.level == ctx.L - 2
    np.testing.assert_allclose(ctx.decrypt_vec(ct), a, atol=1e-5)


@pytest.mark.parametrize("steps", [1, 3, -1, 17])
def test_rotate(ctx, steps):
    a = rand_vec(ctx, 10, cplx=True)
    ctx.ensure_galois([steps])
    got = ctx.decrypt_vec_complex(ctx.rotate(ctx.encrypt(a), steps))
    np.testing.assert_allclose(got, np.roll(a, -steps), atol=1e-4)


def test_conjugate(ctx):
    a = rand_vec(ctx, 11, cplx=True)
    ctx.ensure_galois([], conj=True)
    got = ctx.decrypt_vec_complex(ctx.conjugate(ctx.encrypt(a)))
    np.testing.assert_allclose(got, np.conj(a), atol=1e-4)


def test_hoisted_rotations(ctx):
    a = rand_vec(ctx, 12, cplx=True)
    steps = (0, 1, 2, 5, 9)
    ctx.ensure_galois(steps)
    outs = ctx.hoisted_rotations(ctx.encrypt(a), steps)
    for s, o in zip(steps, outs):
        np.testing.assert_allclose(ctx.decrypt_vec_complex(o), np.roll(a, -s),
                                   atol=1e-4)


def test_rotate_at_low_level(ctx):
    a = rand_vec(ctx, 13)
    ctx.ensure_galois([2])
    ct = ctx.mod_drop(ctx.encrypt(a), 2)
    got = ctx.decrypt_vec(ctx.rotate(ct, 2))
    np.testing.assert_allclose(got, np.roll(a, -2), atol=1e-4)


def test_three_special_primes(ctx3):
    a = rand_vec(ctx3, 14, cplx=True)
    b = rand_vec(ctx3, 15, cplx=True)
    ctx3.ensure_galois([4])
    prod = ctx3.rescale(ctx3.multiply(ctx3.encrypt(a), ctx3.encrypt(b)))
    np.testing.assert_allclose(ctx3.decrypt_vec_complex(prod), a * b, atol=1e-4)
    rot = ctx3.rotate(ctx3.encrypt(a), 4)
    np.testing.assert_allclose(ctx3.decrypt_vec_complex(rot), np.roll(a, -4),
                               atol=1e-4)


def test_encrypt_replicated(ctx):
    x = np.arange(8) / 8.0
    ct = ctx.encrypt_replicated(x)
    got = ctx.decrypt_vec(ct)
    np.testing.assert_allclose(got, np.tile(x, ctx.slots // 8), atol=1e-5)


# --- dnum (grouped-digit hybrid keyswitch) ------------------------------

@pytest.fixture(scope="module")
def ctx_dnum():
    # L=8 limbs in dnum=3 groups of 3/3/2; K=3 specials cover each
    # group product (2 scale primes + q0 < 3 specials)
    return CkksContext(CkksParams(n=256, num_limbs=8, num_special=3,
                                  dnum=3), seed=9)


def test_dnum_multiply_relin(ctx_dnum):
    ctx = ctx_dnum
    a = rand_vec(ctx, 20, cplx=True)
    b = rand_vec(ctx, 21, cplx=True)
    prod = ctx.rescale(ctx.multiply(ctx.encrypt(a), ctx.encrypt(b)))
    np.testing.assert_allclose(ctx.decrypt_vec_complex(prod), a * b,
                               atol=1e-4)


@pytest.mark.parametrize("steps", [1, 5])
def test_dnum_rotate(ctx_dnum, steps):
    ctx = ctx_dnum
    a = rand_vec(ctx, 22, cplx=True)
    ctx.ensure_galois([steps])
    got = ctx.decrypt_vec_complex(ctx.rotate(ctx.encrypt(a), steps))
    np.testing.assert_allclose(got, np.roll(a, -steps), atol=1e-4)


def test_dnum_rotate_partial_group_level(ctx_dnum):
    """Levels that cut a digit group mid-way (l=4, 5, 7) must still
    keyswitch exactly: the last digit's active member set shrinks."""
    ctx = ctx_dnum
    a = rand_vec(ctx, 23, cplx=True)
    ctx.ensure_galois([3])
    for lvl in (4, 5, 7, 2):
        ct = ctx.mod_switch_to(ctx.encrypt(a), lvl)
        got = ctx.decrypt_vec_complex(ctx.rotate(ct, 3))
        np.testing.assert_allclose(got, np.roll(a, -3), atol=1e-4,
                                   err_msg=f"level {lvl}")


def test_dnum_deep_chain(ctx_dnum):
    """Repeated multiply+rescale down the chain with relin at every level."""
    ctx = ctx_dnum
    a = rand_vec(ctx, 24, mag=0.9)
    ct = ctx.encrypt(a)
    ref = a.copy()
    other = rand_vec(ctx, 25, mag=0.9)
    while ct.level > 2:
        o = ctx.encrypt(other, level=ct.level)
        ct = ctx.rescale(ctx.multiply(ct, o))
        ref = ref * other
    np.testing.assert_allclose(ctx.decrypt_vec(ct), ref, atol=1e-3)


def test_security_statement():
    """Per-preset security accounting (VERDICT r4 #8): shallow presets
    meet the 128-bit standard table; deep/bootstrap presets are honestly
    research-grade."""
    from fhe_spear_tpu.ckks import CkksParams

    p = CkksParams.retrieval()
    assert p.log_qp <= 218
    assert p.security_statement().startswith("standard-128")
    assert CkksParams.client_aided().security_statement().startswith(
        "standard-128")

    deep = CkksParams.deep(8192, 58, num_special=12)
    s = deep.security_statement()
    assert s.startswith("research-grade") and "218" in s

    boot = CkksParams.bootstrap(16384, 46, 8, dnum=6)
    s = boot.security_statement()
    assert s.startswith("research-grade")
    assert "sparse secret" in s and "438" in s
