"""Negacyclic NTT/iNTT over RNS limbs, built for TPU vector units.

Formulation: a gather-free Stockham-style radix-2 decimation-in-frequency
transform.  Every stage is a contiguous split + butterfly + restack, so XLA
lowers it to pure VPU work with no scatter/gather; the same jnp body runs
unchanged inside Pallas kernels.

  forward:  twist x_j *= psi^j, then cyclic DIF-FFT stages.
            Output bin b holds m(psi^(2*bitrev(b)+1))  ("frequency domain",
            bit-reversed evaluation order — pointwise ops and automorphism
            permutations all operate consistently in this order).
  inverse:  reversed stages, then untwist by psi^(-j) * N^(-1).

All residues are in the Montgomery domain (see core/modops.py); twiddle
tables are pre-converted so every butterfly costs one mont_mul + add/sub.

Replaces the CUDA NTT of the reference's PhantomFHE fork (SURVEY.md N1).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from .primes import Prime

__all__ = ["NttContext", "bitrev_indices", "automorphism_perm", "coeff_automorphism_np"]


def _pow_table(base: int, count: int, p: int) -> np.ndarray:
    """[base^0, base^1, ..., base^(count-1)] mod p as uint64 (vectorized)."""
    j = np.arange(count, dtype=np.uint64)
    out = np.ones(count, dtype=np.uint64)
    sq = base % p
    bit = 0
    while (1 << bit) < count:
        mask = (j >> np.uint64(bit)) & np.uint64(1)
        out = np.where(mask == 1, out * sq % p, out)
        sq = sq * sq % p
        bit += 1
    return out


def bitrev_indices(n: int) -> np.ndarray:
    """Bit-reversal permutation of range(n)."""
    logn = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _eval_exponents(n: int) -> np.ndarray:
    """e(b): output bin b holds the evaluation of m at psi^e(b), e odd mod 2n."""
    return (2 * bitrev_indices(n) + 1) % (2 * n)


def automorphism_perm(n: int, g: int) -> np.ndarray:
    """Permutation perm s.t. NTT(m(X^g))[b] = NTT(m)[perm[b]].

    m(X^g) evaluated at psi^e equals m evaluated at psi^(e*g), so bin b of
    the transformed poly must fetch the bin whose exponent is e(b)*g mod 2n.
    Mirrors the Galois-element machinery of the reference
    (scripts/bootstrap_generation.py:18-33, gpu/phantom_binding.cu:124-126).
    """
    e = _eval_exponents(n)
    target = (e * g) % (2 * n)
    # bin with exponent t sits at position bitrev((t-1)/2)
    rev = bitrev_indices(n)
    return rev[(target - 1) // 2]


def automorphism_perm_natural(n: int, g: int) -> np.ndarray:
    """automorphism_perm for NATURAL bin order (bin b holds m(psi^(2b+1)),
    the four-step backend's order): source bin = ((2b+1)g mod 2n - 1)/2."""
    t = (2 * np.arange(n, dtype=np.int64) + 1) * g % (2 * n)
    return (t - 1) // 2


def coeff_automorphism_np(a: np.ndarray, g: int) -> np.ndarray:
    """m(X) -> m(X^g) in coefficient form (host-side, used in keygen).

    X^(j*g) = (-1)^(floor(j*g/n)) * X^(j*g mod n) in the negacyclic ring.
    `a` has shape [..., n] of int64/uint64 residues mod p (caller reduces).
    """
    n = a.shape[-1]
    j = np.arange(n, dtype=np.int64)
    jg = j * g
    dest = jg % n
    sign = 1 - 2 * ((jg // n) % 2)  # +1 or -1
    out = np.zeros_like(a)
    # scatter: coefficient j of a lands (signed) at position dest[j]
    out[..., dest] = a[..., j] * sign
    return out


@dataclass(frozen=True, eq=False)
class NttContext:
    """Device-resident tables for a fixed (N, primes) pair.

    Data layout convention throughout the framework: residue tensors have
    shape [..., L, N] (limb axis second-to-last), uint32 Montgomery domain.

    eq=False gives identity hashing, so a context can be passed as a static
    argument to jax.jit (eager dispatch is far too slow for per-op use; all
    composite ops are jitted with the context closed over as constants).
    `rows` arguments must be hashable (tuple or None) for the same reason.
    """

    n: int
    logn: int
    primes: tuple[Prime, ...]
    p: jnp.ndarray            # [L, 1] uint32
    pinv: jnp.ndarray         # [L, 1] uint32
    r2: jnp.ndarray           # [L, 1] uint32 (R^2 mod p)
    psi: jnp.ndarray          # [L, N] twist psi^j        (Montgomery form)
    psi_inv_n: jnp.ndarray    # [L, N] psi^(-j) * n^(-1)  (Montgomery form)
    fwd_tw: tuple = field(repr=False)   # stage s: [L, 1, n >> (s+1)]
    inv_tw: tuple = field(repr=False)
    # Shoup companions (PLAIN constants + floor(w*2^32/p)): every multiply
    # whose one operand is a fixed table entry runs via shoup_mul (5
    # multiplies) instead of mont_mul (8) — bitwise-identical outputs
    psi_w: jnp.ndarray = field(repr=False, default=None)
    psi_ws: jnp.ndarray = field(repr=False, default=None)
    psiinv_w: jnp.ndarray = field(repr=False, default=None)
    psiinv_ws: jnp.ndarray = field(repr=False, default=None)
    r1_w: jnp.ndarray = field(repr=False, default=None)   # R mod p
    r1_ws: jnp.ndarray = field(repr=False, default=None)
    fwd_tw_w: tuple = field(repr=False, default=None)
    fwd_tw_ws: tuple = field(repr=False, default=None)
    inv_tw_w: tuple = field(repr=False, default=None)
    inv_tw_ws: tuple = field(repr=False, default=None)

    @classmethod
    def build(cls, n: int, primes: tuple[Prime, ...]) -> "NttContext":
        logn = n.bit_length() - 1
        assert 1 << logn == n
        L = len(primes)
        p_np = np.array([q.p for q in primes], dtype=np.uint64)
        r_np = np.array([q.mont_r for q in primes], dtype=np.uint64)

        psi_rows, psiinv_rows = [], []
        psi_p, psiinv_p = [], []                       # plain values
        fwd_stage_rows = [[] for _ in range(logn)]
        inv_stage_rows = [[] for _ in range(logn)]
        fwd_p = [[] for _ in range(logn)]
        inv_p = [[] for _ in range(logn)]
        for q in primes:
            psi = q.root
            omega = psi * psi % q.p
            psi_t = _pow_table(psi, n, q.p)
            psi_p.append(psi_t)
            psi_rows.append(psi_t * q.mont_r % q.p)
            ninv = pow(n, -1, q.p)
            psi_inv_t = _pow_table(pow(psi, -1, q.p), n, q.p)
            psiinv_p.append(psi_inv_t * ninv % q.p)
            psiinv_rows.append(psi_inv_t * ninv % q.p * q.mont_r % q.p)
            w_p = _pow_table(omega, n // 2, q.p)
            winv_p = _pow_table(pow(omega, -1, q.p), n // 2, q.p)
            w_t = w_p * q.mont_r % q.p
            winv_t = winv_p * q.mont_r % q.p
            for s in range(logn):
                half = n >> (s + 1)
                fwd_stage_rows[s].append(w_t[:: 1 << s][:half])
                inv_stage_rows[s].append(winv_t[:: 1 << s][:half])
                fwd_p[s].append(w_p[:: 1 << s][:half])
                inv_p[s].append(winv_p[:: 1 << s][:half])

        u32 = lambda x: jnp.asarray(np.asarray(x, dtype=np.uint32))
        shoup = lambda w_obj, q: (w_obj.astype(object) << 32) // q.p
        r1 = np.array([q.mont_r for q in primes], dtype=np.uint64)

        def pair(rows_plain, shape3=False):
            """(plain, shoup) jnp tables from per-prime plain rows."""
            w = np.stack(rows_plain)
            ws = np.stack([np.asarray(shoup(r, q), dtype=np.uint64)
                           for r, q in zip(rows_plain, primes)])
            if shape3:
                return u32(w[:, None, :]), u32(ws[:, None, :])
            return u32(w), u32(ws)

        psi_w, psi_ws = pair(psi_p)
        psiinv_w, psiinv_ws = pair(psiinv_p)
        r1_w, r1_ws = pair([np.array([r]) for r in r1])
        fwd_pairs = [pair(fwd_p[s], shape3=True) for s in range(logn)]
        inv_pairs = [pair(inv_p[s], shape3=True) for s in range(logn)]

        return cls(
            n=n,
            logn=logn,
            primes=primes,
            p=u32(p_np[:, None]),
            pinv=u32(np.array([q.mont_pinv for q in primes], dtype=np.uint64)[:, None]),
            r2=u32(np.array([q.mont_r2 for q in primes], dtype=np.uint64)[:, None]),
            psi=u32(np.stack(psi_rows)),
            psi_inv_n=u32(np.stack(psiinv_rows)),
            fwd_tw=tuple(u32(np.stack(rows)[:, None, :]) for rows in fwd_stage_rows),
            inv_tw=tuple(u32(np.stack(rows)[:, None, :]) for rows in inv_stage_rows),
            psi_w=psi_w, psi_ws=psi_ws,
            psiinv_w=psiinv_w, psiinv_ws=psiinv_ws,
            r1_w=r1_w, r1_ws=r1_ws,
            fwd_tw_w=tuple(pw for pw, _ in fwd_pairs),
            fwd_tw_ws=tuple(pws for _, pws in fwd_pairs),
            inv_tw_w=tuple(pw for pw, _ in inv_pairs),
            inv_tw_ws=tuple(pws for _, pws in inv_pairs),
        )

    # -- transforms (pure jnp; usable under jit / inside Pallas bodies) ----
    #
    # `rows`: optional static sequence of limb indices selecting which prime
    # domains the [..., R, N] limb axis lives in (default: all primes in
    # order).  Used by keyswitch base extension, where one source polynomial
    # is transformed into many different limb domains.

    def _sel(self, table: jnp.ndarray, rows) -> jnp.ndarray:
        if rows is None:
            return table
        return table[jnp.asarray(np.asarray(rows, dtype=np.int32))]

    # -- table-passing forms (for shard_map bodies, where the limb subset
    #    is device-dependent and tables arrive as sharded arguments) ------

    order = "stockham"

    def autoperm(self, g: int) -> np.ndarray:
        """Eval-domain automorphism permutation in THIS backend's bin
        order (overridden by parallel.ntt_fourstep.FourStepBackend)."""
        return automorphism_perm(self.n, g)

    def tables(self, rows=None) -> dict:
        """Bundle the per-limb tables (selectable, shardable pytree)."""
        return {
            "p": self._sel(self.p, rows), "pinv": self._sel(self.pinv, rows),
            "psi": self._sel(self.psi, rows),
            "psi_inv_n": self._sel(self.psi_inv_n, rows),
            "fwd_tw": tuple(self._sel(t, rows) for t in self.fwd_tw),
            "inv_tw": tuple(self._sel(t, rows) for t in self.inv_tw),
        }

    @staticmethod
    def ntt_t(x: jnp.ndarray, tb: dict) -> jnp.ndarray:
        """Forward NTT with explicit tables; x [..., R, N]."""
        from .modops import mont_mul, add_mod, sub_mod

        lead = x.shape[:-2]
        R, n = x.shape[-2:]
        logn = n.bit_length() - 1
        p, pinv = tb["p"], tb["pinv"]
        p3, pinv3 = p[:, :, None], pinv[:, :, None]
        x = mont_mul(x, tb["psi"], p, pinv)
        x = x.reshape(lead + (R, 1, n))
        for s in range(logn):
            half = n >> (s + 1)
            lo, hi = x[..., :half], x[..., half:]
            u = add_mod(lo, hi, p3)
            v = mont_mul(sub_mod(lo, hi, p3), tb["fwd_tw"][s], p3, pinv3)
            x = jnp.stack([u, v], axis=-2).reshape(lead + (R, 2 << s, half))
        return x.reshape(lead + (R, n))

    @staticmethod
    def intt_t(y: jnp.ndarray, tb: dict) -> jnp.ndarray:
        """Inverse NTT with explicit tables; y [..., R, N]."""
        from .modops import mont_mul, add_mod, sub_mod

        lead = y.shape[:-2]
        R, n = y.shape[-2:]
        logn = n.bit_length() - 1
        p, pinv = tb["p"], tb["pinv"]
        p3, pinv3 = p[:, :, None], pinv[:, :, None]
        x = y.reshape(lead + (R, n, 1))
        for s in range(logn - 1, -1, -1):
            half = n >> (s + 1)
            x = x.reshape(lead + (R, 1 << s, 2, half))
            u, v = x[..., 0, :], x[..., 1, :]
            t = mont_mul(v, tb["inv_tw"][s], p3, pinv3)
            x = jnp.concatenate([add_mod(u, t, p3), sub_mod(u, t, p3)],
                                axis=-1)
        x = x.reshape(lead + (R, n))
        return mont_mul(x, tb["psi_inv_n"], p, pinv)

    # NOTE (round-3, measured): the Shoup/Harvey constant-multiplication
    # form (modops.shoup_mul + the *_w/*_ws tables below) has ~40% fewer
    # VPU multiplies per twiddle product, but the END-TO-END token got
    # 11% SLOWER on v5e (9.34 -> 10.42 s) when ntt/intt/to_mont used it —
    # the Montgomery chain evidently lowers/fuses better (shared 16-bit
    # operand splits, one table stream per stage instead of two).  The
    # transforms therefore stay on mont_mul; shoup tables remain for
    # kernels that can exploit them (and as the measured record).

    def ntt(self, x: jnp.ndarray, rows=None) -> jnp.ndarray:
        """Forward negacyclic NTT.  x: [..., R, N] Mont -> [..., R, N] Mont."""
        from .modops import mont_mul, add_mod, sub_mod

        lead = x.shape[:-2]
        R, n = x.shape[-2:]
        p, pinv = self._sel(self.p, rows), self._sel(self.pinv, rows)
        p3, pinv3 = p[:, :, None], pinv[:, :, None]
        x = mont_mul(x, self._sel(self.psi, rows), p, pinv)
        x = x.reshape(lead + (R, 1, n))
        for s in range(self.logn):
            half = n >> (s + 1)
            lo, hi = x[..., :half], x[..., half:]
            u = add_mod(lo, hi, p3)
            tw = self._sel(self.fwd_tw[s], rows)
            v = mont_mul(sub_mod(lo, hi, p3), tw, p3, pinv3)
            x = jnp.stack([u, v], axis=-2).reshape(lead + (R, 2 << s, half))
        return x.reshape(lead + (R, n))

    def intt(self, y: jnp.ndarray, rows=None) -> jnp.ndarray:
        """Inverse negacyclic NTT.  y: [..., R, N] Mont -> [..., R, N] Mont."""
        from .modops import mont_mul, add_mod, sub_mod

        lead = y.shape[:-2]
        R, n = y.shape[-2:]
        p, pinv = self._sel(self.p, rows), self._sel(self.pinv, rows)
        p3, pinv3 = p[:, :, None], pinv[:, :, None]
        x = y.reshape(lead + (R, n, 1))
        for s in range(self.logn - 1, -1, -1):
            half = n >> (s + 1)
            x = x.reshape(lead + (R, 1 << s, 2, half))
            u, v = x[..., 0, :], x[..., 1, :]
            t = mont_mul(v, self._sel(self.inv_tw[s], rows), p3, pinv3)
            x = jnp.concatenate([add_mod(u, t, p3), sub_mod(u, t, p3)], axis=-1)
        x = x.reshape(lead + (R, n))
        return mont_mul(x, self._sel(self.psi_inv_n, rows), p, pinv)

    def to_mont(self, x: jnp.ndarray, rows=None) -> jnp.ndarray:
        from .modops import mont_mul

        return mont_mul(x, self._sel(self.r2, rows), self._sel(self.p, rows),
                        self._sel(self.pinv, rows))

    def from_mont(self, x: jnp.ndarray, rows=None) -> jnp.ndarray:
        from .modops import mont_reduce_wide

        return mont_reduce_wide(jnp.zeros_like(x), x, self._sel(self.p, rows),
                                self._sel(self.pinv, rows))
