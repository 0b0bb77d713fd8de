"""Pallas fused negacyclic NTT/iNTT (production kernel, round-3).

The jnp Stockham chain (core/ntt.py) materializes every butterfly stage
through HBM — ~2x log2(N) tensor round trips per transform.  This kernel
keeps a [TILE, N] tile of polynomials in VMEM across the whole transform:
one HBM read + one write (DESIGN §9/§14).

Structure (what the Mosaic lowering handles well, probed on v5e —
tools/pallas_probe.py):
  * stages with butterfly distance >= 128 use the stack/reshape split —
    pure sublane ops, lane (last-dim) width never drops below 128;
  * the final log2(128) stages pair elements WITHIN a 128-lane block, so
    they run as lane rotations (pltpu.roll) + iota masks + lane-tiled
    twiddle tables — no lane-granularity reshapes (which crash or stall
    the Mosaic compiler) and no HBM traffic.  The u|w packing of the
    in-lane form is memory-layout-identical to the stack+reshape form,
    so outputs are BITWISE equal to NttContext.ntt/intt.

Layout: x [R, B, N] — R limb rows (grid axis; per-limb tables selected by
BlockSpec index maps), B polynomials tiled by the second grid axis.
Verified bitwise in tests/test_ntt_pallas.py (interpret) and on the real
TPU by tools/bench_ntt.py.

Replaces the fused CUDA NTT of the reference's PhantomFHE fork
(SURVEY.md N1).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modops import mont_mul, add_mod, sub_mod
from .ntt import NttContext

__all__ = ["ntt_pallas", "intt_pallas", "PallasBackend"]

_LANE = 128  # butterflies below this distance run as lane rotations


def _tile(b: int, n: int) -> int:
    """Rows per grid step.  Callers pad b to a multiple of 8 (_pad8);
    Mosaic block dims must be (8k, 128k) multiples.  Keep the VMEM
    working set (a few live [tile, N] u32 buffers) well under the 16 MB
    scoped-vmem budget."""
    cap = 16 if n <= 4096 else 8
    return cap if b % cap == 0 else 8


def _pad8(x: jnp.ndarray):
    """Pad the batch (second-to-last) axis of [R, B, N] up to 8k rows."""
    b = x.shape[-2]
    pad = (-b) % 8
    if pad == 0:
        return x, b
    width = [(0, 0)] * (x.ndim - 2) + [(0, pad), (0, 0)]
    return jnp.pad(x, width), b


# ---------------------------------------------------------------------------
# host-side: lane-tiled twiddle tables for the in-lane stages
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _lane_tables(ctx: NttContext):
    """[L, 7, 128] lane-shaped twiddles (Montgomery form) for the in-lane
    stages: entry [l, i, j] = tw_{s_i}[j mod h_i].

    Forward row i covers stage s = logn-7+i (h = 64 >> i); inverse row i
    covers stage s = logn-1-i (h = 1 << i)."""
    logn = ctx.logn
    fwd = np.empty((len(ctx.primes), 7, _LANE), dtype=np.uint32)
    inv = np.empty_like(fwd)
    for i in range(7):
        s_f = logn - 7 + i
        h_f = _LANE >> (i + 1)
        fwd[:, i] = np.tile(np.asarray(ctx.fwd_tw[s_f])[:, 0, :],
                            (1, _LANE // h_f))
        s_i = logn - 1 - i
        h_i = 1 << i
        inv[:, i] = np.tile(np.asarray(ctx.inv_tw[s_i])[:, 0, :],
                            (1, _LANE // h_i))
    return fwd, inv


def _sel_rows(t, rows):
    return t if rows is None else t[jnp.asarray(list(rows), dtype=jnp.int32)]


def _sel_np(t, rows):
    return jnp.asarray(
        t if rows is None else t[np.asarray(list(rows), dtype=np.int32)])


# ---------------------------------------------------------------------------
# pallas calls
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _fwd_call(ctx: NttContext, r: int, b: int, n: int, interpret: bool):
    logn = ctx.logn
    head = logn - 7
    tile = _tile(b, n)
    g = n // _LANE

    def kernel(x_ref, psi_ref, lt_ref, p_ref, pinv_ref, *refs):
        out_ref = refs[-1]
        tw_refs = refs[:-1]
        p = p_ref[0, 0, 0]
        pinv = pinv_ref[0, 0, 0]
        v = mont_mul(x_ref[0], psi_ref[0], p, pinv)       # twist [tile, N]
        v = v.reshape(tile, 1, n)
        for s in range(head):                             # lane width >= 128
            half = n >> (s + 1)
            lo, hi = v[..., :half], v[..., half:]
            u = add_mod(lo, hi, p)
            w = mont_mul(sub_mod(lo, hi, p), tw_refs[s][0], p, pinv)
            v = jnp.stack([u, w], axis=-2).reshape(tile, 2 << s, half)
        # in-lane stages: butterfly distance 64 .. 1 via lane rotations
        v = v.reshape(tile, g, _LANE)
        i = lax.broadcasted_iota(jnp.int32, (1, 1, _LANE), 2)
        for idx in range(7):
            h = _LANE >> (idx + 1)
            hi_m = (i & h) != 0
            vr = pltpu.roll(v, h, 2)                      # vr[j] = v[j-h]
            vl = pltpu.roll(v, _LANE - h, 2)              # vl[j] = v[j+h]
            vx = jnp.where(hi_m, vr, vl)
            T = lt_ref[0, idx][None, None, :]
            v = jnp.where(hi_m,
                          mont_mul(sub_mod(vx, v, p), T, p, pinv),
                          add_mod(v, vx, p))
        out_ref[0] = v.reshape(tile, n)

    lane = lambda i, j: (i, j, 0)
    limb = lambda i, j: (i, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(r, b // tile),
        in_specs=[
            pl.BlockSpec((1, tile, n), lane),             # x
            pl.BlockSpec((1, 1, n), limb),                # psi
            pl.BlockSpec((1, 7, _LANE), limb),            # lane twiddles
            pl.BlockSpec((1, 1, 1), limb),                # p
            pl.BlockSpec((1, 1, 1), limb),                # pinv
        ] + [pl.BlockSpec((1, 1, n >> (s + 1)), limb) for s in range(head)],
        out_specs=pl.BlockSpec((1, tile, n), lane),
        out_shape=jax.ShapeDtypeStruct((r, b, n), jnp.uint32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _inv_call(ctx: NttContext, r: int, b: int, n: int, interpret: bool):
    logn = ctx.logn
    head = logn - 7
    tile = _tile(b, n)
    g = n // _LANE

    def kernel(y_ref, psiinv_ref, lt_ref, p_ref, pinv_ref, *refs):
        out_ref = refs[-1]
        tw_refs = refs[:-1]
        p = p_ref[0, 0, 0]
        pinv = pinv_ref[0, 0, 0]
        # in-lane stages first: distance 1 .. 64
        v = y_ref[0].reshape(tile, g, _LANE)
        i = lax.broadcasted_iota(jnp.int32, (1, 1, _LANE), 2)
        for idx in range(7):
            h = 1 << idx
            hi_m = (i & h) != 0
            vr = pltpu.roll(v, h, 2)
            vl = pltpu.roll(v, _LANE - h, 2)
            vx = jnp.where(hi_m, vr, vl)
            uval = jnp.where(hi_m, vx, v)
            wval = jnp.where(hi_m, v, vx)
            T = lt_ref[0, idx][None, None, :]
            t = mont_mul(wval, T, p, pinv)
            v = jnp.where(hi_m, sub_mod(uval, t, p), add_mod(uval, t, p))
        v = v.reshape(tile, g, _LANE)
        for s in range(head - 1, -1, -1):                 # widening stages
            half = n >> (s + 1)
            v = v.reshape(tile, 1 << s, 2, half)
            u, w = v[..., 0, :], v[..., 1, :]
            tt = mont_mul(w, tw_refs[s][0], p, pinv)
            v = jnp.concatenate([add_mod(u, tt, p), sub_mod(u, tt, p)],
                                axis=-1)
        v = v.reshape(tile, n)
        out_ref[0] = mont_mul(v, psiinv_ref[0], p, pinv)  # untwist * n^-1

    lane = lambda i, j: (i, j, 0)
    limb = lambda i, j: (i, 0, 0)
    return pl.pallas_call(
        kernel,
        grid=(r, b // tile),
        in_specs=[
            pl.BlockSpec((1, tile, n), lane),             # y
            pl.BlockSpec((1, 1, n), limb),                # psi_inv_n
            pl.BlockSpec((1, 7, _LANE), limb),            # lane twiddles
            pl.BlockSpec((1, 1, 1), limb),                # p
            pl.BlockSpec((1, 1, 1), limb),                # pinv
        ] + [pl.BlockSpec((1, 1, n >> (s + 1)), limb) for s in range(head)],
        out_specs=pl.BlockSpec((1, tile, n), lane),
        out_shape=jax.ShapeDtypeStruct((r, b, n), jnp.uint32),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# host-facing entry points
# ---------------------------------------------------------------------------


def ntt_pallas(ctx: NttContext, x: jnp.ndarray, rows=None,
               interpret: bool = False) -> jnp.ndarray:
    """Forward NTT, fused in VMEM.  x: [R, B, N] uint32 Mont (R limbs
    selected by `rows`, B polys per limb)."""
    x, b0 = _pad8(x)
    r, b, n = x.shape
    lt_f, _ = _lane_tables(ctx)
    head = ctx.logn - 7
    args = (
        _sel_rows(ctx.psi, rows)[:, None, :],
        _sel_np(lt_f, rows),
        _sel_rows(ctx.p, rows)[:, :, None],
        _sel_rows(ctx.pinv, rows)[:, :, None],
    ) + tuple(_sel_rows(ctx.fwd_tw[s], rows) for s in range(head))
    y = _fwd_call(ctx, r, b, n, interpret)(x, *args)
    return y if b == b0 else y[:, :b0]


def intt_pallas(ctx: NttContext, y: jnp.ndarray, rows=None,
                interpret: bool = False) -> jnp.ndarray:
    """Inverse NTT, fused in VMEM.  y: [R, B, N]."""
    y, b0 = _pad8(y)
    r, b, n = y.shape
    _, lt_i = _lane_tables(ctx)
    head = ctx.logn - 7
    args = (
        _sel_rows(ctx.psi_inv_n, rows)[:, None, :],
        _sel_np(lt_i, rows),
        _sel_rows(ctx.p, rows)[:, :, None],
        _sel_rows(ctx.pinv, rows)[:, :, None],
    ) + tuple(_sel_rows(ctx.inv_tw[s], rows) for s in range(head))
    x = _inv_call(ctx, r, b, n, interpret)(y, *args)
    return x if b == b0 else x[:, :b0]


class PallasBackend:
    """NttContext-compatible backend running every transform through the
    fused Pallas kernel (params.ntt_backend="pallas").

    Bin order and tables are IDENTICAL to the Stockham chain — bitwise-
    compatible drop-in (same autoperm, same serialized form), unlike the
    natural-order FourStepBackend.  [..., R, N] operands are regrouped to
    [R, B, N] (one transpose each way — two HBM passes traded against
    ~log2(N) per-stage round trips).  On CPU (tests) the kernel runs in
    interpreter mode.
    """

    order = "stockham"

    def __init__(self, base: NttContext):
        self.base = base
        self._interpret = jax.default_backend() == "cpu"

    def __getattr__(self, name):
        return getattr(self.base, name)

    def _apply(self, fn, x, rows):
        rows_t = tuple(rows) if rows is not None else None
        lead = x.shape[:-2]
        r, n = x.shape[-2:]
        x3 = x.reshape((-1, r, n)) if lead else x[None]
        y = fn(self.base, jnp.swapaxes(x3, 0, 1), rows_t,
               interpret=self._interpret)
        y = jnp.swapaxes(y, 0, 1)
        return y.reshape(lead + (r, n)) if lead else y[0]

    def ntt(self, x: jnp.ndarray, rows=None) -> jnp.ndarray:
        return self._apply(ntt_pallas, x, rows)

    def intt(self, y: jnp.ndarray, rows=None) -> jnp.ndarray:
        return self._apply(intt_pallas, y, rows)
