"""Pallas fused four-step NTT: twist + column DFT + twiddle + row DFT in
one kernel, the whole [B, N] residue row resident in VMEM.

The XLA MXU backend (parallel/ntt_fourstep.ntt_mxu_b) already runs the
contractions on the systolic array but materializes each stage through
HBM; this kernel is the fusion step — one HBM read + one write per
(limb, batch-row) transform (docs/DESIGN.md §9/§14).

dot_impl:
  "f32":  limb matmuls as float32 dots with precision=HIGHEST (exact —
          every partial sum < 2^21 < 2^24; safe on every backend).
  "int8": s8 x s8 -> s32 systolic dots (fastest path where Mosaic
          supports int8 matmul).

Bitwise-equal to FourStepNtt.ntt_mxu_b / .ntt (tests/test_ntt_fourstep).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from .modops import mont_mul, add_mod

__all__ = ["ntt_fourstep_pallas"]


def _limb_dot(a8, x_u32, dot_impl, flat: bool = False):
    """a8: [5M, K] int8 limbs, x_u32: [K, J] uint32 -> S [5, M, 5, J] u32
    (flat=True: the raw [5M, 5J] matrix — Mosaic rejects the 2-D -> 4-D
    reshape with "infer-vector-layout: unsupported shape cast", so the
    Pallas path keeps the flat grid and _recombine slices blocks).

    Splits x into 5 x 7-bit limbs on the fly, runs ONE [5M, K] x [K, 5J]
    contraction, returns the int32 partial-sum grid as uint32."""
    k, j = x_u32.shape
    # limbs fit in 7 bits: cast via int32 (Mosaic has no uint32->float32
    # or uint32->int8 cast; the int32 hop is exact for values < 2^31)
    xb = [((x_u32 >> jnp.uint32(7 * b)) & jnp.uint32(0x7F)
           ).astype(jnp.int32) for b in range(5)]
    if dot_impl == "int8":
        X = jnp.concatenate([v.astype(jnp.int8) for v in xb], axis=-1)
        S = lax.dot_general(a8, X, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    else:
        X = jnp.concatenate([v.astype(jnp.float32) for v in xb], axis=-1)
        S = lax.dot_general(a8.astype(jnp.float32), X,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST)
        S = S.astype(jnp.int32)
    if flat:
        return S.astype(jnp.uint32)                  # [5M, 5J]
    m5 = a8.shape[0]
    return S.reshape(5, m5 // 5, 5, j).astype(jnp.uint32)


def _recombine(S, csh, p, pinv, flat_mj=None):
    """S: [5, M, 5, J] u32 limb-pair partial sums -> [M, J] Montgomery
    product sum via sum_s mont_mul(T_s, 2^(7s) mod p).  With flat_mj
    = (M, J), S is the raw [5M, 5J] grid and blocks are SLICED out
    (Mosaic-compatible; no 4-D reshape)."""
    if flat_mj is not None:
        m, j = flat_mj
        blk = lambda a, b: S[a * m:(a + 1) * m, b * j:(b + 1) * j]
    else:
        blk = lambda a, b: S[a, :, b, :]
    out = None
    for s in range(9):
        lo_a = max(0, s - 4)
        T = blk(lo_a, s - lo_a)
        for a in range(lo_a + 1, min(s, 4) + 1):
            T = T + blk(a, s - a)                     # < 2^24, no overflow
        term = mont_mul(T, csh[s], p, pinv)
        out = term if out is None else add_mod(out, term, p)
    return out


def ntt_fourstep_pallas(fs, x, rows=None, dot_impl: str = "f32",
                        interpret: bool = False, variant: str = "3d"):
    """x: [R, B, N] uint32 Mont coefficients -> [R, B, N] four-step bins.

    fs: a parallel.ntt_fourstep.FourStepNtt (tables reused verbatim).
    One grid step per limb row; everything for that row stays in VMEM.

    variant="2d": per-batch-row body built ONLY from 2-D matmuls and 2-D
    transposes — no rank-3 transposes/reshapes, the constructs the remote
    Mosaic compiler rejects (docs/NOTES_r3.md probe ladder).  Bitwise
    identical to the 3d variant and to FourStepNtt.ntt_mxu_b.
    """
    if variant == "2d":
        return _ntt_fourstep_pallas_2d(fs, x, rows, dot_impl, interpret)
    if variant == "2dio":
        return _ntt_fourstep_pallas_2dio(fs, x, rows, dot_impl, interpret)
    import numpy as np

    r, bsz, n = x.shape
    n1, n2 = fs.n1, fs.n2
    sel = lambda t: np.asarray(t) if rows is None else np.asarray(t)[
        np.asarray(rows, dtype=np.int32)]
    psi = jnp.asarray(sel(fs.base.psi))              # [R, N]
    w1_8 = jnp.asarray(sel(fs.w1_8)).reshape(r, 5 * n1, n1)
    w2_8 = jnp.asarray(sel(fs.w2_8)).reshape(r, 5 * n2, n2)
    tw = jnp.asarray(sel(fs.tw))                     # [R, N1, N2]
    csh = jnp.asarray(sel(fs.csh))                   # [R, 9]
    p = jnp.asarray(fs._sel_np(rows, "p"))[:, 0]     # [R]
    pinv = jnp.asarray(fs._sel_np(rows, "pinv"))[:, 0]

    def kernel(x_ref, psi_ref, w1_ref, w2_ref, tw_ref, csh_ref, p_ref,
               pinv_ref, out_ref):
        pq = p_ref[0, 0, 0]
        piv = pinv_ref[0, 0, 0]
        cs = csh_ref[0, 0]
        v = mont_mul(x_ref[0], psi_ref[0, 0], pq, piv)  # twist   [B, N]
        # column DFT over j1: [n1, B*n2]
        xt = v.reshape(bsz, n1, n2).swapaxes(0, 1).reshape(n1, bsz * n2)
        a = _recombine(_limb_dot(w1_ref[0], xt, dot_impl), cs, pq, piv)
        # twiddle: a [k1, B, j2] * tw[k1, j2]
        a = a.reshape(n1, bsz, n2)
        a = mont_mul(a, tw_ref[0][:, None, :], pq, piv)
        # row DFT over j2: [n2, B*k1]
        at = a.transpose(2, 1, 0).reshape(n2, bsz * n1)
        b = _recombine(_limb_dot(w2_ref[0], at, dot_impl), cs, pq, piv)
        # b [k2, B, k1] -> [B, N] with k = k2*N1 + k1
        out_ref[0] = b.reshape(n2, bsz, n1).swapaxes(0, 1).reshape(bsz, n)

    grid = (r,)
    row3 = lambda i: (i, 0, 0)
    # every per-limb operand is rank-3 with a leading grid axis and a
    # block equal to the full trailing dims: the Mosaic lowering requires
    # the last two block dims to be (multiples of 8, 128) OR exactly the
    # array dims — a rank-2 (1, n) block over a (R, n) array violates that
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bsz, n), row3),          # x
            pl.BlockSpec((1, 1, n), row3),            # psi
            pl.BlockSpec((1, 5 * n1, n1), row3),      # w1 limbs
            pl.BlockSpec((1, 5 * n2, n2), row3),      # w2 limbs
            pl.BlockSpec((1, n1, n2), row3),          # twiddle
            pl.BlockSpec((1, 1, 9), row3),            # csh
            pl.BlockSpec((1, 1, 1), row3),            # p
            pl.BlockSpec((1, 1, 1), row3),            # pinv
        ],
        out_specs=pl.BlockSpec((1, bsz, n), row3),
        out_shape=jax.ShapeDtypeStruct((r, bsz, n), jnp.uint32),
        interpret=interpret,
    )(x, psi[:, None, :], w1_8, w2_8, tw, csh[:, None, :], p[:, None, None],
      pinv[:, None, None])


def _ntt_fourstep_pallas_2d(fs, x, rows=None, dot_impl: str = "f32",
                            interpret: bool = False):
    """2-D-only body (see ntt_fourstep_pallas variant="2d").

    Per batch row b:  v = twist(x_b) as [n1, n2] (row split — the last
    dim stays a 128-lane multiple);  A = W1-limb-dot(v)  (2-D matmul);
    A *= tw;  B = W2-limb-dot(A^T)  (one 2-D transpose + 2-D matmul);
    out_b = flatten(B^T is NOT needed: B is [k2, k1], and the natural
    four-step bin order is k = k2*n1 + k1, i.e. row-major flatten of B).
    """
    import numpy as np

    r, bsz, n = x.shape
    n1, n2 = fs.n1, fs.n2
    sel = lambda t: np.asarray(t) if rows is None else np.asarray(t)[
        np.asarray(rows, dtype=np.int32)]
    psi2 = jnp.asarray(sel(fs.base.psi)).reshape(r, n1, n2)
    w1_8 = jnp.asarray(sel(fs.w1_8)).reshape(r, 5 * n1, n1)
    w2_8 = jnp.asarray(sel(fs.w2_8)).reshape(r, 5 * n2, n2)
    tw = jnp.asarray(sel(fs.tw))                     # [R, N1, N2]
    csh = jnp.asarray(sel(fs.csh))                   # [R, 9]
    p = jnp.asarray(fs._sel_np(rows, "p"))[:, 0]     # [R]
    pinv = jnp.asarray(fs._sel_np(rows, "pinv"))[:, 0]

    def kernel(x_ref, psi_ref, w1_ref, w2_ref, tw_ref, csh_ref, p_ref,
               pinv_ref, out_ref):
        pq = p_ref[0, 0, 0]
        piv = pinv_ref[0, 0, 0]
        cs = csh_ref[0, 0]
        for b in range(bsz):
            v = x_ref[0, b].reshape(n1, n2)              # row split
            v = mont_mul(v, psi_ref[0], pq, piv)         # twist
            # column DFT over j1: ONE 2-D limb matmul [5n1, n1] x [n1, n2].
            # flat=True keeps the [5n1, 5n2] partial-sum grid 2-D and
            # _recombine SLICES limb blocks out — the 2-D -> 4-D reshape
            # of the default path is the "infer-vector-layout: unsupported
            # shape cast" Mosaic rejects (ADVICE r4 #1).
            a = _recombine(_limb_dot(w1_ref[0], v, dot_impl, flat=True),
                           cs, pq, piv, flat_mj=(n1, n2))
            a = mont_mul(a, tw_ref[0], pq, piv)          # twiddle [n1, n2]
            # row DFT over j2: 2-D transpose + 2-D limb matmul
            at = a.T                                     # [n2, n1]
            bb = _recombine(_limb_dot(w2_ref[0], at, dot_impl, flat=True),
                            cs, pq, piv, flat_mj=(n2, n1))
            out_ref[0, b] = bb.reshape(n)                # k = k2*n1 + k1
    grid = (r,)
    row3 = lambda i: (i, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bsz, n), row3),          # x
            pl.BlockSpec((1, n1, n2), row3),          # psi (2-D per limb)
            pl.BlockSpec((1, 5 * n1, n1), row3),      # w1 limbs
            pl.BlockSpec((1, 5 * n2, n2), row3),      # w2 limbs
            pl.BlockSpec((1, n1, n2), row3),          # twiddle
            pl.BlockSpec((1, 1, 9), row3),            # csh
            pl.BlockSpec((1, 1, 1), row3),            # p
            pl.BlockSpec((1, 1, 1), row3),            # pinv
        ],
        out_specs=pl.BlockSpec((1, bsz, n), row3),
        out_shape=jax.ShapeDtypeStruct((r, bsz, n), jnp.uint32),
        interpret=interpret,
    )(x, psi2, w1_8, w2_8, tw, csh[:, None, :], p[:, None, None],
      pinv[:, None, None])


def _ntt_fourstep_pallas_2dio(fs, x, rows=None, dot_impl: str = "f32",
                              interpret: bool = False):
    """Rank-4-I/O body: the real-TPU Mosaic failure of the 2d variant is
    the in-kernel 1-D -> 2-D vector reshape of the input row
    ("infer-vector-layout: unsupported shape cast" on
    vector<1x1x8192xi32> -> vector<128x64xi32>, measured 2026-08-21,
    docs/NOTES_r5.md).  Here the [n1, n2] split happens OUTSIDE the
    kernel (an XLA reshape is free) and the refs are rank-4, so the
    kernel body contains only 2-D elementwise ops, 2-D matmuls, grid-
    block slices and ONE 2-D transpose — no vector shape casts at all.
    Output ref is [R, B, n2, n1]; the natural four-step bin order
    k = k2*n1 + k1 is its row-major flatten, done by the caller."""
    import numpy as np

    r, bsz, n = x.shape
    n1, n2 = fs.n1, fs.n2
    sel = lambda t: np.asarray(t) if rows is None else np.asarray(t)[
        np.asarray(rows, dtype=np.int32)]
    psi2 = jnp.asarray(sel(fs.base.psi)).reshape(r, n1, n2)
    w1_8 = jnp.asarray(sel(fs.w1_8)).reshape(r, 5 * n1, n1)
    w2_8 = jnp.asarray(sel(fs.w2_8)).reshape(r, 5 * n2, n2)
    tw = jnp.asarray(sel(fs.tw))                     # [R, N1, N2]
    csh = jnp.asarray(sel(fs.csh))                   # [R, 9]
    p = jnp.asarray(fs._sel_np(rows, "p"))[:, 0]     # [R]
    pinv = jnp.asarray(fs._sel_np(rows, "pinv"))[:, 0]

    def kernel(x_ref, psi_ref, w1_ref, w2_ref, tw_ref, csh_ref, p_ref,
               pinv_ref, out_ref):
        pq = p_ref[0, 0, 0]
        piv = pinv_ref[0, 0, 0]
        cs = csh_ref[0, 0]
        for b in range(bsz):
            v = x_ref[0, b]                              # [n1, n2], no cast
            v = mont_mul(v, psi_ref[0], pq, piv)         # twist
            a = _recombine(_limb_dot(w1_ref[0], v, dot_impl, flat=True),
                           cs, pq, piv, flat_mj=(n1, n2))
            a = mont_mul(a, tw_ref[0], pq, piv)          # twiddle [n1, n2]
            at = a.T                                     # [n2, n1]
            bb = _recombine(_limb_dot(w2_ref[0], at, dot_impl, flat=True),
                            cs, pq, piv, flat_mj=(n2, n1))
            out_ref[0, b] = bb                           # [n2, n1]
    grid = (r,)
    row3 = lambda i: (i, 0, 0)
    row4 = lambda i: (i, 0, 0, 0)
    out4 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bsz, n1, n2), row4),     # x as [.., n1, n2]
            pl.BlockSpec((1, n1, n2), row3),          # psi (2-D per limb)
            pl.BlockSpec((1, 5 * n1, n1), row3),      # w1 limbs
            pl.BlockSpec((1, 5 * n2, n2), row3),      # w2 limbs
            pl.BlockSpec((1, n1, n2), row3),          # twiddle
            pl.BlockSpec((1, 1, 9), row3),            # csh
            pl.BlockSpec((1, 1, 1), row3),            # p
            pl.BlockSpec((1, 1, 1), row3),            # pinv
        ],
        out_specs=pl.BlockSpec((1, bsz, n2, n1), row4),
        out_shape=jax.ShapeDtypeStruct((r, bsz, n2, n1), jnp.uint32),
        interpret=interpret,
    )(x.reshape(r, bsz, n1, n2), psi2, w1_8, w2_8, tw, csh[:, None, :],
      p[:, None, None], pinv[:, None, None])
    return out4.reshape(r, bsz, n)                    # k = k2*n1 + k1
