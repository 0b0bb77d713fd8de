"""Modular collectives over device meshes.

RNS residues are uint32 < p < 2^31; a plain `psum` over more than one
device can wrap mod 2^32.  `psum_mod` splits each residue into 16-bit
halves, psums both, and recombines modulo p using one Montgomery multiply
— exact for up to 2^11 devices per axis (the binding constraint is the
single conditional subtract before recombination: half-sums must stay
below the smallest prime, ~2^28, so D*2^16 < 2^27 -> D <= 2^11) — the TPU-native analog of the reference's
single-GPU accumulation loops, designed for giant-step partial-sum
reduction over ICI (SURVEY.md §2 parallelism mandate / BASELINE.json).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.modops import mont_mul, add_mod, cond_sub

__all__ = ["psum_mod", "make_shift16_const"]


def make_shift16_const(primes) -> jnp.ndarray:
    """(2^16 * R) mod p per prime — lets mont_mul(x, c) compute x*2^16 mod p."""
    vals = [(1 << 16) * pr.mont_r % pr.p for pr in primes]
    return jnp.asarray(np.asarray(vals, dtype=np.uint32)[:, None])


def psum_mod(x: jnp.ndarray, axis_name: str, p: jnp.ndarray,
             pinv: jnp.ndarray, shift16: jnp.ndarray) -> jnp.ndarray:
    """Exact modular all-reduce sum of residues over a mesh axis.

    x: [..., l, N] uint32 residues < p.  p/pinv/shift16: [l, 1] tables
    (level-selected).  Supports up to 2^11 devices on the axis: half-sums
    stay < 2^27 < p, so one conditional subtract suffices before
    recombination.
    """
    lo = jax.lax.psum(x & jnp.uint32(0xFFFF), axis_name)
    hi = jax.lax.psum(x >> jnp.uint32(16), axis_name)
    lo = cond_sub(lo, p)
    hi = cond_sub(hi, p)
    return add_mod(mont_mul(hi, shift16, p, pinv), lo, p)
