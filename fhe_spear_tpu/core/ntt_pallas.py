"""Pallas fused NTT prototype (round-2 kernel track; see docs/DESIGN.md §9).

The jnp NTT materializes every butterfly stage through XLA; this kernel
keeps the whole [l, N] residue block in VMEM across all log2(N) stages —
one HBM read + one write per transform instead of ~13.

Status: correctness-verified in interpreter mode (tests/test_ntt_pallas);
real-TPU Mosaic compilation needs lane-friendly late-stage butterflies
(the final log2(128) stages shuffle within 128-lane registers) — the
four-step/MXU formulation in DESIGN §9 is the production path.  This
module establishes the kernel scaffolding and the oracle test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .modops import mont_mul, add_mod, sub_mod
from .ntt import NttContext


def ntt_pallas(ctx: NttContext, x: jnp.ndarray, interpret: bool = True
               ) -> jnp.ndarray:
    """Forward negacyclic NTT, all stages fused in VMEM.

    x: [B, L, N] uint32 Montgomery; uses all of ctx's primes.
    """
    b, l, n = x.shape
    logn = ctx.logn

    def kernel(x_ref, psi_ref, p_ref, pinv_ref, *tw_refs):
        out_ref = tw_refs[-1]
        tw_refs = tw_refs[:-1]
        p = p_ref[:]
        pinv = pinv_ref[:]
        p3, pinv3 = p[:, :, None], pinv[:, :, None]
        v = mont_mul(x_ref[0], psi_ref[:], p, pinv)
        v = v.reshape(l, 1, n)
        for s in range(logn):
            half = n >> (s + 1)
            lo, hi = v[..., :half], v[..., half:]
            u = add_mod(lo, hi, p3)
            w = mont_mul(sub_mod(lo, hi, p3), tw_refs[s][:], p3, pinv3)
            v = jnp.stack([u, w], axis=-2).reshape(l, 2 << s, half)
        out_ref[0] = v.reshape(l, n)

    in_specs = [
        pl.BlockSpec((1, l, n), lambda i: (i, 0, 0)),   # x (per-batch block)
        pl.BlockSpec((l, n), lambda i: (0, 0)),         # psi
        pl.BlockSpec((l, 1), lambda i: (0, 0)),         # p
        pl.BlockSpec((l, 1), lambda i: (0, 0)),         # pinv
    ] + [pl.BlockSpec((l, 1, n >> (s + 1)), lambda i: (0, 0, 0))
         for s in range(logn)]

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, l, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, l, n), jnp.uint32),
        interpret=interpret,
    )(x, ctx.psi, ctx.p, ctx.pinv, *ctx.fwd_tw)
