"""Device-side modular arithmetic over uint32 RNS limbs (VPU-native).

TPUs have native 32-bit integer lanes but no 64-bit multiplier, so every
residue lives in a uint32 and the RNS primes are < 2^31.  A 32x32->64
product is assembled from four 16x16 partial products; modular reduction
is Montgomery (REDC with R = 2^32).  All device-resident residues are kept
in the Montgomery domain permanently — one multiplication primitive
(`mont_mul`) serves NTT twiddles, ct x pt, and ct x ct alike, additions are
domain-agnostic, and conversion happens only at encode/decode time.

These functions are plain jnp and therefore work identically on the CPU
backend (tests), inside jit-compiled XLA (default path), and inside Pallas
kernel bodies (fast path).

Replaces the 64-bit CUDA modular arithmetic of the reference's PhantomFHE
backend (see /root/reference/gpu/phantom_binding.cu and SURVEY.md N1).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "mul_hi_u32",
    "mont_mul",
    "mont_reduce_wide",
    "add_mod",
    "sub_mod",
    "neg_mod",
    "cond_sub",
    "barrett_reduce",
    "shoup_mul",
]

# python int literals (not jnp scalars): Pallas kernels reject captured
# device constants, and jnp promotes int literals to uint32 for free
_MASK16 = 0xFFFF
_SIXTEEN = 16


def mul_hi_u32(a, b):
    """High 32 bits of the 64-bit product a*b (a, b uint32 arrays)."""
    a0 = a & _MASK16
    a1 = a >> _SIXTEEN
    b0 = b & _MASK16
    b1 = b >> _SIXTEEN
    # all partial products < 2^32; carries tracked exactly
    t = a1 * b0 + ((a0 * b0) >> _SIXTEEN)  # <= (2^16-1)(2^16-1) + (2^16-1) < 2^32
    w1 = (t & _MASK16) + a0 * b1           # < 2^16 + (2^16-1)^2 < 2^32
    return a1 * b1 + (t >> _SIXTEEN) + (w1 >> _SIXTEEN)


def cond_sub(x, p):
    """x - p if x >= p else x (lazy-reduction fixup)."""
    return jnp.where(x >= p, x - p, x)


def add_mod(a, b, p):
    """(a + b) mod p for a, b in [0, p), p < 2^31 (no uint32 overflow)."""
    return cond_sub(a + b, p)


def sub_mod(a, b, p):
    """(a - b) mod p for a, b in [0, p)."""
    return jnp.where(a >= b, a - b, a + p - b)


def neg_mod(a, p):
    """(-a) mod p for a in [0, p)."""
    return jnp.where(a == 0, a, p - a)


def mont_reduce_wide(hi, lo, p, pinv):
    """Montgomery REDC of the 64-bit value hi*2^32 + lo; returns T*R^-1 mod p.

    Requires hi*2^32 + lo < p * 2^32 (true for any product of reduced
    residues).  Output in [0, p).
    """
    m = lo * pinv  # mod 2^32 (wrapping)
    # lo + mullo(m, p) == 0 mod 2^32 by construction of pinv; the carry out
    # of that addition is exactly (lo != 0).
    carry = (lo != jnp.uint32(0)).astype(jnp.uint32)
    t = hi + mul_hi_u32(m, p) + carry  # < 2p, no overflow since p < 2^31
    return cond_sub(t, p)


def mont_mul(a, b, p, pinv):
    """Montgomery product: a*b*R^-1 mod p.

    If a and b are both in the Montgomery domain (xR mod p), the result is
    the Montgomery form of the true product.  a, b in [0, p); p < 2^31.
    """
    lo = a * b  # wrapping uint32 multiply = exact low word
    hi = mul_hi_u32(a, b)
    return mont_reduce_wide(hi, lo, p, pinv)


def shoup_mul(a, w, ws, p):
    """(a * w) mod p for a CONSTANT multiplicand w (Shoup/Harvey trick).

    ws = floor(w * 2^32 / p) is precomputed once per constant.  Costs 3
    mul-hi partial products + 2 low multiplies — vs mont_mul's 8 — so
    every twiddle/twist multiply in the NTT (where one operand is a fixed
    table entry) gets ~40% cheaper on the VPU.

    Exact for a in [0, p), w in [0, p), p < 2^31: q = floor(a*ws/2^32)
    satisfies a*w - q*p in [0, 2p) (Harvey, "Faster arithmetic for
    number-theoretic transforms"), fixed by one conditional subtract.
    Note w is the PLAIN value (not Montgomery form): multiplying a
    Montgomery-form a by a plain constant keeps the Montgomery form, so
    outputs are bitwise-identical to mont_mul(a, w_mont).
    """
    q = mul_hi_u32(a, ws)
    r = a * w - q * p  # wrapping uint32; true value in [0, 2p)
    return cond_sub(r, p)


def barrett_reduce(x, p, mu):
    """x mod p for arbitrary uint32 x, p < 2^31, mu = floor(2^32 / p).

    Division-free (mul-hi based) so it vectorizes on the TPU VPU; used by
    keyswitch digit extension where a coefficient mod q_j is re-reduced
    modulo every other prime in the basis.
    """
    q = mul_hi_u32(x, mu)
    r = x - q * p  # wrapping; true remainder in [0, 2p)
    return cond_sub(r, p)
