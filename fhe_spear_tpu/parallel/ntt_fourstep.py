"""Four-step NTT: matmul formulation + multi-chip stage exchange.

The production NTT (core/ntt.py) is a gather-free Stockham radix-2 chain —
pure VPU work, single-device.  This module implements the same transform
in the four-step formulation N = N1 x N2:

    view coefficients as X[j1, j2] (j = j1*N2 + j2, twist by psi^j first)
    1. column DFTs   A[k1, j2] = sum_j1 W1[k1, j1] * X[j1, j2]
    2. twiddle       A *= w^(k1*j2)
    3. row DFTs      B[k1, k2] = sum_j2 A[k1, j2] * W2[k2, j2]
    4. bin (2k+1) with k = k2*N1 + k1 holds m(psi^(2k+1))

Why it exists:
  * The column/row transforms are MODULAR MATMULS — the shape the MXU
    wants (docs/DESIGN.md §9: uint32 split into 8-bit limbs, 16 int8
    systolic matmuls with exact int32 accumulation replace ~N log N VPU
    butterflies).  This module is the correctness reference for that
    kernel: same tables, same Montgomery domain, bitwise-testable.
  * Sharding: with X sharded on the j2 axis, step 1 and 2 are local;
    step 3 needs j2 contractions, so the shard axis flips via ONE
    lax.all_to_all over ICI (the "NTT butterfly stage exchange" of
    SURVEY.md §5 / BASELINE.json) — NOT log2(N) per-stage exchanges.

Output-order contract (verified bitwise in tests/test_ntt_fourstep.py):
    stockham_ntt(x)[b] == fourstep_ntt(x)[bitrev(b)]
both in the Montgomery domain.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.modops import mont_mul, add_mod
from ..core.ntt import NttContext, bitrev_indices

__all__ = ["FourStepNtt"]


def _pow_mod(base: int, e: np.ndarray, p: int) -> np.ndarray:
    out = np.ones_like(e, dtype=object)
    b = base % p
    ee = e.astype(object)
    bit = 0
    while (1 << bit) <= int(e.max(initial=0)):
        mask = (e >> bit) & 1
        out = np.where(mask == 1, out * b % p, out)
        b = b * b % p
        bit += 1
    return out.astype(np.uint64)


class FourStepNtt:
    """Matmul-form negacyclic NTT for a fixed (NttContext, N1, N2).

    ntt(x, rows):      [..., R, N] Mont -> [..., R, N] Mont, four-step
                       standard order (use bitrev to match core/ntt.py).
    ntt_sharded(mesh): same math with the N2/N1 axes sharded over a mesh
                       axis and one all-to-all between the two matmul
                       steps.
    """

    def __init__(self, ntt: NttContext, n1: int, n2: int):
        assert n1 * n2 == ntt.n, (n1, n2, ntt.n)
        self.base = ntt
        self.n1, self.n2 = n1, n2
        n = ntt.n
        L = len(ntt.primes)
        w1 = np.zeros((L, n1, n1), dtype=np.uint32)
        w2 = np.zeros((L, n2, n2), dtype=np.uint32)
        tw = np.zeros((L, n1, n2), dtype=np.uint32)
        for li, pr in enumerate(ntt.primes):
            p = pr.p
            omega = pr.root * pr.root % p          # psi^2, order n
            k1j1 = np.outer(np.arange(n1), np.arange(n1)) * n2 % n
            w1[li] = (_pow_mod(omega, k1j1, p) * pr.mont_r % p).astype(
                np.uint32)
            k2j2 = np.outer(np.arange(n2), np.arange(n2)) * n1 % n
            w2[li] = (_pow_mod(omega, k2j2, p) * pr.mont_r % p).astype(
                np.uint32)
            k1j2 = np.outer(np.arange(n1), np.arange(n2)) % n
            tw[li] = (_pow_mod(omega, k1j2, p) * pr.mont_r % p).astype(
                np.uint32)
        self.w1 = jnp.asarray(w1)      # [L, N1, N1] Mont
        self.w2 = jnp.asarray(w2)      # [L, N2, N2] Mont
        self.tw = jnp.asarray(tw)      # [L, N1, N2] Mont
        # bin b of the Stockham output = four-step bin bitrev(b)
        self.to_stockham = jnp.asarray(bitrev_indices(n))

    # -- modular matmul: sum_k A[i,k] * X[..., k, j] -----------------------

    @staticmethod
    def _matmul_mod(a, x, p, pinv):
        """a: [R, M, K] Mont, x: [..., R, K, J] Mont -> [..., R, M, J].

        Log-depth tree of mont_mul partial products; every product is a
        valid Montgomery product, adds reduce mod p.  (The MXU kernel of
        DESIGN §9 replaces exactly this contraction.)
        """
        prod = mont_mul(a[..., None], x[..., None, :, :], p[..., None],
                        pinv[..., None])           # [..., R, M, K, J]
        k = prod.shape[-2]
        while k > 1:
            if k % 2:
                head = prod[..., :1, :]
                prod = prod[..., 1:, :]
                prod = prod.at[..., 0, :].set(
                    add_mod(prod[..., 0, :], head[..., 0, :], p[..., None]))
                k -= 1
            half = k // 2
            prod = add_mod(prod[..., :half, :], prod[..., half:, :],
                           p[..., None])
            k = half
        return prod[..., 0, :]

    def _sel(self, t, rows):
        if rows is None:
            return t
        return t[jnp.asarray(np.asarray(rows, dtype=np.int32))]

    def ntt(self, x: jnp.ndarray, rows=None) -> jnp.ndarray:
        """[..., R, N] Mont -> [..., R, N] Mont, four-step order."""
        ntt = self.base
        n1, n2 = self.n1, self.n2
        p = self._sel(ntt.p, rows)
        pinv = self._sel(ntt.pinv, rows)
        psi = self._sel(ntt.psi, rows)
        x = mont_mul(x, psi, p, pinv)                      # twist
        lead = x.shape[:-1]
        x = x.reshape(lead + (n1, n2))
        p2, pinv2 = p[..., None], pinv[..., None]
        a = self._matmul_mod(self._sel(self.w1, rows), x, p2, pinv2)
        a = mont_mul(a, self._sel(self.tw, rows), p2, pinv2)
        # row DFT: contract over j2 -> transpose to put j2 in the K slot
        at = jnp.swapaxes(a, -1, -2)                       # [..., N2=j2? no]
        b = self._matmul_mod(self._sel(self.w2, rows), at, p2, pinv2)
        # b[..., k2, k1]; flat bin k = k2*N1 + k1
        return b.reshape(lead + (ntt.n,))

    def ntt_stockham_order(self, x: jnp.ndarray, rows=None) -> jnp.ndarray:
        """Four-step NTT permuted to match core/ntt.py bitwise."""
        return jnp.take(self.ntt(x, rows), self.to_stockham, axis=-1)

    # -- sharded: j2-sharded input, ONE all-to-all, k1-sharded output ------

    @functools.lru_cache(maxsize=None)
    def _sharded_fn(self, mesh: Mesh, axis: str, rows: tuple):
        ntt = self.base
        n1, n2 = self.n1, self.n2
        ndev = mesh.shape[axis]
        assert n2 % ndev == 0 and n1 % ndev == 0, (n1, n2, ndev)

        p = self._sel(ntt.p, rows)
        pinv = self._sel(ntt.pinv, rows)
        psi3 = self._sel(ntt.psi, rows).reshape(-1, n1, n2)

        def body(x, w1_, tw_, w2_, psi_):
            # x: [R, N1, N2/ndev] local coefficients (already j2-sharded)
            p2, pinv2 = p[..., None], pinv[..., None]
            x = mont_mul(x, psi_, p2, pinv2)
            a = self._matmul_mod(w1_, x, p2, pinv2)        # local col DFT
            a = mont_mul(a, tw_, p2, pinv2)                # local twiddle
            # shard-axis flip: j2-sharded -> k1-sharded, one collective
            a = jnp.swapaxes(a, -1, -2)                    # [R, j2loc, N1]
            a = a.reshape(a.shape[:-1] + (ndev, n1 // ndev))
            a = jnp.swapaxes(a, -3, -2)                    # [R, ndev, j2loc, n1loc]
            ax = a.ndim - 3                    # StableHLO needs >= 0 dims
            a = lax.all_to_all(a, axis, ax, ax, tiled=False)
            # [R, src, j2loc, k1loc] -> [R, j2 FULL, k1loc] (src-major = global j2)
            a = a.reshape(a.shape[:-3] + (n2, n1 // ndev))
            b = self._matmul_mod(w2_, a, p2, pinv2)        # [R, k2, k1loc]
            return b

        spec_x = P(None, None, axis)           # [R, N1, N2] sharded on j2
        f = shard_map(
            body, mesh=mesh,
            in_specs=(spec_x, P(), P(None, None, axis), P(), P(None, None, axis)),
            out_specs=P(None, None, axis),     # [R, N2, N1] sharded on k1
            check_vma=False)
        w1_ = self._sel(self.w1, rows)
        tw_ = self._sel(self.tw, rows)
        w2_ = self._sel(self.w2, rows)
        jf = jax.jit(f)
        return lambda x: jf(x, w1_, tw_, w2_, psi3)

    def ntt_sharded(self, x: jnp.ndarray, mesh: Mesh, axis: str = "coeff",
                    rows=None) -> jnp.ndarray:
        """[R, N] Mont -> [R, N] Mont (four-step order), with the inner
        matmuls sharded over `axis` and one all-to-all between them."""
        rows_t = tuple(rows) if rows is not None else None
        lead = x.shape[:-1]
        xm = x.reshape(lead + (self.n1, self.n2))
        b = self._sharded_fn(mesh, axis, rows_t)(xm)
        return b.reshape(lead + (self.base.n,))
