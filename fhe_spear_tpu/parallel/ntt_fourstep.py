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

__all__ = ["FourStepNtt", "FourStepBackend"]


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


def _limbs7(w: np.ndarray) -> np.ndarray:
    """uint32 [L, M, K] -> 7-bit limbs [L, 5, M, K] int8 (values 0..127)."""
    out = np.stack([(w >> np.uint32(7 * b)) & np.uint32(0x7F)
                    for b in range(5)], axis=1)
    return out.astype(np.int8)


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
        # -- MXU path tables ------------------------------------------------
        # DFT matrices as 7-bit limbs (int8; values 0..127 so the int8 MXU
        # contraction is exact), and the recombination constants
        # 2^(7s) mod p (PLAIN domain: one mont_mul per shift group folds
        # the R^-1 of the Montgomery product back in)
        self.w1_8 = jnp.asarray(_limbs7(w1))     # [L, 5, N1, N1] int8
        self.w2_8 = jnp.asarray(_limbs7(w2))     # [L, 5, N2, N2] int8
        csh = np.zeros((L, 9), dtype=np.uint32)
        for li, pr in enumerate(ntt.primes):
            for s in range(9):
                csh[li, s] = (1 << (7 * s)) % pr.p
        self.csh = jnp.asarray(csh)              # [L, 9]
        # inverse direction: x[j1,j2] = psi^-j/n * sum_{k1,k2}
        #   X[k2,k1] w^-(j2 k2 N1) w^-(j2 k1) w^-(j1 k1 N2)
        w1i = np.zeros((L, n1, n1), dtype=np.uint32)
        w2i = np.zeros((L, n2, n2), dtype=np.uint32)
        twi = np.zeros((L, n2, n1), dtype=np.uint32)
        for li, pr in enumerate(ntt.primes):
            p_ = pr.p
            oinv = pow(pr.root * pr.root % p_, -1, p_)
            j1k1 = np.outer(np.arange(n1), np.arange(n1)) * n2 % n
            w1i[li] = (_pow_mod(oinv, j1k1, p_) * pr.mont_r % p_).astype(
                np.uint32)
            j2k2 = np.outer(np.arange(n2), np.arange(n2)) * n1 % n
            w2i[li] = (_pow_mod(oinv, j2k2, p_) * pr.mont_r % p_).astype(
                np.uint32)
            j2k1 = np.outer(np.arange(n2), np.arange(n1)) % n
            twi[li] = (_pow_mod(oinv, j2k1, p_) * pr.mont_r % p_).astype(
                np.uint32)
        self.w1i_8 = jnp.asarray(_limbs7(w1i))   # [L, 5, N1, N1] int8
        self.w2i_8 = jnp.asarray(_limbs7(w2i))   # [L, 5, N2, N2] int8
        self.twi = jnp.asarray(twi)              # [L, N2, N1] Mont

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

    # -- MXU modular matmul: int8 limb contraction, exact ------------------
    #
    # A and X are uint32 Montgomery residues split into 5 x 7-bit limbs.
    # The full 62-bit integer product sum_k A[m,k]*X[k,j] is assembled from
    # one int8 systolic matmul [R, 5M, K] x [R, K, 5J] -> [R, 5M, 5J] int32
    # (every partial sum < 2^14 * K <= 2^21, exactly representable), the
    # anti-diagonal limb groups T_s (< 2^24) are recombined as
    # sum_s mont_mul(T_s, 2^(7s) mod p) = (A.X) * R^-1 mod p — bitwise
    # identical to the mont_mul tree of _matmul_mod.  This is the DESIGN §9
    # kernel: the contraction runs on the MXU instead of ~K VPU mont_muls.

    def _matmul_mod_mxu(self, a8, x, p, pinv, csh):
        """a8: [R, 5, M, K] int8, x: [R, K, J] uint32 -> [R, M, J] uint32."""
        r, _, m, k = a8.shape
        j = x.shape[-1]
        xb = jnp.stack([((x >> jnp.uint32(7 * b)) & jnp.uint32(0x7F)
                         ).astype(jnp.int8) for b in range(5)],
                       axis=1)                          # [R, 5, K, J]
        A = a8.reshape(r, 5 * m, k)
        X = xb.transpose(0, 2, 1, 3).reshape(r, k, 5 * j)
        S = lax.dot_general(A, X, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.int32)
        S = S.reshape(r, 5, m, 5, j).astype(jnp.uint32)
        p3, pinv3 = p[..., None], pinv[..., None]       # [R, 1, 1]
        out = None
        for s in range(9):
            lo_a = max(0, s - 4)
            T = S[:, lo_a, :, s - lo_a, :]
            for a in range(lo_a + 1, min(s, 4) + 1):
                T = T + S[:, a, :, s - a, :]            # < 2^24, no overflow
            term = mont_mul(T, csh[:, s, None, None], p3, pinv3)
            out = term if out is None else add_mod(out, term, p3)
        return out

    def ntt_mxu(self, x: jnp.ndarray, rows=None) -> jnp.ndarray:
        """[R, N] Mont -> [R, N] Mont, four-step order, MXU contraction.

        Bitwise-equal to self.ntt (tests/test_ntt_fourstep.py)."""
        ntt = self.base
        n1, n2 = self.n1, self.n2
        p = jnp.asarray(self._sel_np(rows, "p"))
        pinv = jnp.asarray(self._sel_np(rows, "pinv"))
        psi = self._sel(ntt.psi, rows)
        x = mont_mul(x, psi, p, pinv)                   # twist (VPU)
        lead = x.shape[:-1]
        x = x.reshape(lead + (n1, n2))
        csh = self._sel(self.csh, rows)
        a = self._matmul_mod_mxu(self._sel(self.w1_8, rows), x,
                                 p, pinv, csh)
        a = mont_mul(a, self._sel(self.tw, rows),
                     p[..., None], pinv[..., None])     # twiddle (VPU)
        at = jnp.swapaxes(a, -1, -2)
        b = self._matmul_mod_mxu(self._sel(self.w2_8, rows), at,
                                 p, pinv, csh)
        return b.reshape(lead + (ntt.n,))

    def intt_mxu(self, x: jnp.ndarray, rows=None) -> jnp.ndarray:
        """Inverse of ntt_mxu/ntt (four-step bin order in, coefficients
        out), MXU contraction.  intt_mxu(ntt_mxu(x)) == x bitwise."""
        ntt = self.base
        n1, n2 = self.n1, self.n2
        p = jnp.asarray(self._sel_np(rows, "p"))
        pinv = jnp.asarray(self._sel_np(rows, "pinv"))
        csh = self._sel(self.csh, rows)
        lead = x.shape[:-1]
        x = x.reshape(lead + (n2, n1))                  # [R, k2, k1]
        a = self._matmul_mod_mxu(self._sel(self.w2i_8, rows), x,
                                 p, pinv, csh)          # [R, j2, k1]
        a = mont_mul(a, self._sel(self.twi, rows),
                     p[..., None], pinv[..., None])
        at = jnp.swapaxes(a, -1, -2)                    # [R, k1, j2]
        b = self._matmul_mod_mxu(self._sel(self.w1i_8, rows), at,
                                 p, pinv, csh)          # [R, j1, j2]
        b = b.reshape(lead + (ntt.n,))
        return mont_mul(b, self._sel(ntt.psi_inv_n, rows), p, pinv)

    # -- batched variants: [R, B, N] with the batch riding the J axis ------

    def ntt_mxu_b(self, x: jnp.ndarray, rows=None) -> jnp.ndarray:
        """[R, B, N] Mont coefficients -> [R, B, N] four-step bins."""
        ntt = self.base
        n1, n2 = self.n1, self.n2
        r, bsz, _ = x.shape
        p = jnp.asarray(self._sel_np(rows, "p"))
        pinv = jnp.asarray(self._sel_np(rows, "pinv"))
        csh = self._sel(self.csh, rows)
        p2, pinv2 = p[..., None], pinv[..., None]       # [R, 1, 1]
        x = mont_mul(x, self._sel(ntt.psi, rows)[:, None], p2, pinv2)
        x = x.reshape(r, bsz, n1, n2)
        xt = jnp.swapaxes(x, 1, 2).reshape(r, n1, bsz * n2)
        a = self._matmul_mod_mxu(self._sel(self.w1_8, rows), xt,
                                 p, pinv, csh)          # [R, k1, B*j2]
        a = a.reshape(r, n1, bsz, n2)
        a = mont_mul(a, self._sel(self.tw, rows)[:, :, None, :],
                     p2[..., None], pinv2[..., None])
        at = jnp.transpose(a, (0, 3, 2, 1)).reshape(
            r, n2, bsz * n1)                            # [R, j2, B*k1]
        b = self._matmul_mod_mxu(self._sel(self.w2_8, rows), at,
                                 p, pinv, csh)          # [R, k2, B*k1]
        b = b.reshape(r, n2, bsz, n1)
        return jnp.moveaxis(b, 2, 1).reshape(r, bsz, ntt.n)  # k = k2*N1+k1

    def intt_mxu_b(self, x: jnp.ndarray, rows=None) -> jnp.ndarray:
        """[R, B, N] four-step bins -> [R, B, N] Mont coefficients."""
        ntt = self.base
        n1, n2 = self.n1, self.n2
        r, bsz, _ = x.shape
        p = jnp.asarray(self._sel_np(rows, "p"))
        pinv = jnp.asarray(self._sel_np(rows, "pinv"))
        csh = self._sel(self.csh, rows)
        p2, pinv2 = p[..., None], pinv[..., None]
        x = x.reshape(r, bsz, n2, n1)                   # [R, B, k2, k1]
        xt = jnp.swapaxes(x, 1, 2).reshape(r, n2, bsz * n1)
        a = self._matmul_mod_mxu(self._sel(self.w2i_8, rows), xt,
                                 p, pinv, csh)          # [R, j2, B*k1]
        a = a.reshape(r, n2, bsz, n1)
        a = mont_mul(a, self._sel(self.twi, rows)[:, :, None, :],
                     p2[..., None], pinv2[..., None])
        at = jnp.transpose(a, (0, 3, 2, 1)).reshape(
            r, n1, bsz * n2)                            # [R, k1, B*j2]
        b = self._matmul_mod_mxu(self._sel(self.w1i_8, rows), at,
                                 p, pinv, csh)          # [R, j1, B*j2]
        b = b.reshape(r, n1, bsz, n2)
        b = jnp.moveaxis(b, 2, 1).reshape(r, bsz, ntt.n)
        return mont_mul(b, self._sel(ntt.psi_inv_n, rows)[:, None],
                        p2, pinv2)

    def _sel_np(self, rows, which):
        pr = self.base.primes
        idx = range(len(pr)) if rows is None else rows
        if which == "p":
            return np.array([pr[i].p for i in idx], dtype=np.uint32)[:, None]
        return np.array([pr[i].mont_pinv for i in idx],
                        dtype=np.uint32)[:, None]

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


class FourStepBackend:
    """NttContext-compatible transform backend in NATURAL bin order.

    Drop-in for CkksContext (params.ntt_backend="mxu"): ntt/intt run the
    four-step MXU contraction; every other attribute (p, pinv, r2,
    to_mont, from_mont, tables, ...) delegates to the wrapped Stockham
    NttContext.  Bin b holds m(psi^(2b+1)) — NATURAL exponent order (the
    Stockham chain uses bitrev order), so automorphism permutations come
    from autoperm() below and a context built on this backend is
    self-consistent but NOT binary-compatible with a Stockham context
    (coefficient-domain data — serialized keys, i32-staged diagonals — is
    order-free and shared).
    """

    order = "natural"

    def __init__(self, base: NttContext, n1: int | None = None):
        n = base.n
        if n1 is None:
            n1 = 128 if n >= 16384 else max(16, min(64, n // 64))
        self.base = base
        self.fs = FourStepNtt(base, n1, n // n1)

    def __getattr__(self, name):
        return getattr(self.base, name)

    def _flat(self, fn, x, rows):
        lead = x.shape[:-2]
        r, n = x.shape[-2:]
        x2 = x.reshape((-1, r, n)) if lead else x[None]
        y = fn(jnp.swapaxes(x2, 0, 1), rows)            # [R, B, N]
        y = jnp.swapaxes(y, 0, 1)
        return y.reshape(lead + (r, n)) if lead else y[0]

    def ntt(self, x: jnp.ndarray, rows=None) -> jnp.ndarray:
        rows = tuple(rows) if rows is not None else None
        return self._flat(self.fs.ntt_mxu_b, x, rows)

    def intt(self, x: jnp.ndarray, rows=None) -> jnp.ndarray:
        rows = tuple(rows) if rows is not None else None
        return self._flat(self.fs.intt_mxu_b, x, rows)

    def autoperm(self, g: int) -> np.ndarray:
        """NTT(m(X^g))[b] = NTT(m)[perm[b]] in natural bin order:
        exponent of bin b is 2b+1; source bin = ((2b+1)g mod 2n - 1)/2."""
        n = self.base.n
        t = (2 * np.arange(n, dtype=np.int64) + 1) * g % (2 * n)
        return ((t - 1) // 2).astype(np.int64)
