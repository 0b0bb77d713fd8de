"""RNS-limb-sharded keyswitching: rotations with the limb axis partitioned
across a device mesh (the "RNS limbs partitioned across chips" axis of
BASELINE.json; no counterpart in the single-GPU reference).

The only cross-limb step in a keyswitch is the digit broadcast: each
device iNTTs its own limbs' coefficients locally, the coefficient-domain
digit rows are all-gathered over ICI ([l, N] uint32 — 100 KB..3 MB), and
every device then extends the full digit set to *its* limb domains,
multiplies with *its* rows of the keyswitch key, and finishes the
P-division locally (the K special limbs are computed redundantly on every
device — K is 1-3).  NTTs, the dominant cost, never cross devices.

All per-limb tables arrive as sharded shard_map arguments (the
table-passing NTT forms in core/ntt.py), so the body contains no
device-dependent indexing.

Scaling axis of choice for deep (bootstrap-sized) modulus chains where
l = 20-50 limbs dwarf the 2-13 of the client-aided configs.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.modops import (mont_mul, add_mod, sub_mod, barrett_reduce,
                           cond_sub, mont_reduce_wide, mul_hi_u32)
from ..core.ntt import NttContext, automorphism_perm
from ..ckks.context import CkksContext
from ..ckks.ciphertext import Ciphertext

__all__ = ["LimbShardedRotator"]


def _from_mont(x, p, pinv):
    return mont_reduce_wide(jnp.zeros_like(x), x, p, pinv)


class LimbShardedRotator:
    """Slot rotations with ciphertext limbs sharded over mesh axis `axis`."""

    def __init__(self, ctx: CkksContext, mesh: Mesh, level: int,
                 axis: str = "limb"):
        self.ctx = ctx
        self.mesh = mesh
        self.axis = axis
        self.l = level
        assert ctx.gsize == 1, \
            "limb-sharded keyswitch assumes single-limb digits (dnum unset)"
        assert getattr(ctx.ntt, "order", "stockham") == "stockham", \
            "limb-sharded keyswitch uses the Stockham table-passing forms"
        assert level % mesh.shape[axis] == 0, (level, mesh.shape[axis])

    @functools.lru_cache(maxsize=None)
    def _kernel(self, g: int):
        ctx = self.ctx
        l, K, n = self.l, ctx.K, ctx.n
        ntt = ctx.ntt
        rows = tuple(range(l))
        sp_rows = tuple(range(ctx.L, ctx.L + K))
        perm = jnp.asarray(automorphism_perm(n, g))
        ksk = ctx.galois_keys[g]

        # ---- arguments (sharded on the limb axis where noted) ----------
        tb_loc = ntt.tables(rows)                   # sharded: limb rows
        tb_sp = ntt.tables(sp_rows)                 # replicated
        mu_loc = ctx.mu[np.asarray(rows)]           # [l, 1] sharded
        mu_sp = ctx.mu[np.asarray(sp_rows)]
        r2_loc = ntt.r2[np.asarray(rows)]
        qmod_loc = ctx.q_mod[np.asarray(rows)][:, np.asarray(rows)]  # [l,l,1] ax1 sharded
        qmod_sp = ctx.q_mod[np.asarray(rows)][:, np.asarray(sp_rows)]
        qmod_sp_to_loc = ctx.q_mod[np.asarray(sp_rows)][:, np.asarray(rows)]
        qhalf = ctx.q_half[np.asarray(rows)]        # [l,1,1] replicated
        qhalf_sp = ctx.q_half[np.asarray(sp_rows)]
        pinv_mont = ctx.Pinv_mont[:l]               # [l,1] sharded
        pmod_mont = ctx.Pmod_mont[:l]               # [l,1] sharded
        kb_loc, ka_loc = ksk.b[:l][:, np.asarray(rows)], \
            ksk.a[:l][:, np.asarray(rows)]          # [l, l, N] ax1 sharded
        kb_sp, ka_sp = ksk.b[:l][:, np.asarray(sp_rows)], \
            ksk.a[:l][:, np.asarray(sp_rows)]       # [l, K, N] replicated
        if K > 1:
            phinv = ctx.phat_inv_mont               # [K, 1] replicated
            phmod_loc = ctx.phat_mod_mont[:, np.asarray(rows)]  # [K,l,1] ax1 sharded
            sp_muA, sp_B64 = ctx._sp_muA, ctx._sp_B64   # [K,1] closure consts
        else:
            phinv = jnp.zeros((1, 1), jnp.uint32)   # unused placeholders
            phmod_loc = jnp.zeros((1, l, 1), jnp.uint32)
            sp_muA = sp_B64 = None

        def extend(coeffs_all, p_t, mu_t, qmod, qh):
            """[l, N] plain digits -> [l, T, N] centered re-reductions."""
            c = coeffs_all[:, None, :]
            r = barrett_reduce(c, p_t[None], mu_t[None])
            fix = p_t[None] - qmod
            r_neg = cond_sub(r + fix, p_t[None])
            return jnp.where(c >= qh, r_neg, r)

        def body(c, tbl, tbs, mu_l, mu_s, r2l, qm_ll, qm_ls, qm_sl, pim,
                 pmm, kbl, kal, kbs, kas, phinv_a, phmod_a):
            p_l, pinv_l = tbl["p"], tbl["pinv"]
            p_s, pinv_s = tbs["p"], tbs["pinv"]
            cp = jnp.take(c, perm, axis=-1)
            # local digit coefficients, then all-gather the full digit set
            co_loc = _from_mont(NttContext.intt_t(cp[1], tbl), p_l, pinv_l)
            co_all = lax.all_gather(co_loc, self.axis, tiled=True)  # [l, N]
            # extend to local limb domains and (redundantly) to specials
            D_loc = NttContext.ntt_t(
                extend(co_all, p_l, mu_l, qm_ll, qhalf), tbl)
            D_sp = NttContext.ntt_t(
                extend(co_all, p_s, mu_s, qm_ls, qhalf), tbs)
            # digit x key contraction (keys in R^2 form -> Mont output)
            ks_l = [None, None]
            ks_s = [None, None]
            for comp, (kl, ks_) in enumerate(((kbl, kbs), (kal, kas))):
                accl = mont_mul(D_loc[0], kl[0], p_l, pinv_l)
                accs = mont_mul(D_sp[0], ks_[0], p_s, pinv_s)
                for j in range(1, l):
                    accl = add_mod(accl, mont_mul(D_loc[j], kl[j], p_l,
                                                  pinv_l), p_l)
                    accs = add_mod(accs, mont_mul(D_sp[j], ks_[j], p_s,
                                                  pinv_s), p_s)
                ks_l[comp], ks_s[comp] = accl, accs
            ks_l = jnp.stack(ks_l)                   # [2, lloc, N] Mont
            ks_s = jnp.stack(ks_s)                   # [2, K, N] Mont (redund)
            # P-division: specials -> coefficients -> extend to local limbs
            # (CENTERED conversion in both branches — same op order as the
            # single-chip _mod_down, so bitwise equal; see its docstring
            # for the noise analysis of the non-centered form)
            t = _from_mont(NttContext.intt_t(ks_s, tbs), p_s, pinv_s)
            if K == 1:
                cc = t[:, 0][:, None, :]
                r = barrett_reduce(cc, p_l, mu_l)
                fix = p_l - qm_sl[0]
                r_neg = cond_sub(r + fix, p_l)
                u = jnp.where(cc >= qhalf_sp[0], r_neg, r)
            else:
                y = mont_mul(t, phinv_a, p_s, pinv_s)          # [2, K, N]
                u32f = y * sp_muA + mul_hi_u32(y, sp_B64)
                lo = u32f[:, 0]
                hi = jnp.zeros_like(lo)
                for k in range(1, K):
                    tk = u32f[:, k]
                    lo2 = lo + tk
                    hi = hi + (lo2 < tk).astype(jnp.uint32)
                    lo = lo2
                v = hi + (lo >> 31)                            # [2, N]
                r = barrett_reduce(y[:, :, None, :], p_l[None], mu_l[None])
                r = mont_mul(r, phmod_a, p_l, pinv_l)          # [2,K,lloc,N]
                u = r[:, 0]
                for k in range(1, K):
                    u = add_mod(u, r[:, k], p_l)
                vq = mont_mul(v[:, None, :], pmm, p_l, pinv_l)
                u = sub_mod(u, vq, p_l)
            u = mont_mul(NttContext.ntt_t(u, tbl), r2l, p_l, pinv_l)
            out = mont_mul(sub_mod(ks_l, u, p_l), pim, p_l, pinv_l)
            c0 = add_mod(jnp.take(c[0], perm, axis=-1), out[0], p_l)
            return jnp.stack([c0, out[1]])

        ax = self.axis
        row = P(ax, None)
        row3 = P(ax, None, None)
        tb_spec_loc = {"p": row, "pinv": row, "psi": row, "psi_inv_n": row,
                       "fwd_tw": tuple(row3 for _ in tb_loc["fwd_tw"]),
                       "inv_tw": tuple(row3 for _ in tb_loc["inv_tw"])}
        tb_spec_sp = jax.tree_util.tree_map(lambda _: P(), tb_sp,
                                            is_leaf=lambda x: isinstance(
                                                x, jnp.ndarray))
        in_specs = (P(None, ax, None), tb_spec_loc, tb_spec_sp,
                    row, P(), row, P(None, ax, None), P(), P(None, ax, None),
                    row, row, P(None, ax, None), P(None, ax, None), P(), P(),
                    P(), P(None, ax, None))
        f = shard_map(body, mesh=self.mesh, in_specs=in_specs,
                      out_specs=P(None, ax, None), check_vma=False)
        jf = jax.jit(f)
        args = (tb_loc, tb_sp, mu_loc, mu_sp, r2_loc, qmod_loc, qmod_sp,
                qmod_sp_to_loc, pinv_mont, pmod_mont, kb_loc, ka_loc, kb_sp,
                ka_sp, phinv, phmod_loc)
        return lambda c: jf(c, *args)

    def rotate(self, ct: Ciphertext, steps: int) -> Ciphertext:
        assert ct.level == self.l
        g = self.ctx.galois_element(steps)
        self.ctx.ensure_galois([steps])
        return Ciphertext(self._kernel(g)(ct.c), ct.scale)
