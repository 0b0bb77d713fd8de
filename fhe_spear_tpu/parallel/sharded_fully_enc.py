"""Fully-encrypted FFN blocks with every projection sharded over a mesh.

Multi-chip counterpart of models.fully_encrypted.FullyEncryptedFfn (the
reference's fully-encrypted BSGS suite, test_fully_enc_bsgs.py, is
single-GPU; this is the BASELINE.json parallelism mandate applied to it):
the key (D->F) and value (F->D) chunk projections evaluate through the
giant-sharded BSGS kernel (parallel/sharded_bsgs.ShardedBsgsMatvec), so
the two HBM hogs of the reference-scale chain — per-giant rotation-key
stacks and staged block diagonals (docs/NOTES_r3.md postmortem: the
N=16384/L=59 19-block config exceeds one v5e's 15.75 GB) — divide across
the mesh.  The CT-CT square and residual add are elementwise over limbs
and run replicated.

Scale management is EXACT (FullyEncryptedFfn.diag_scales): diagonals are
encoded at their consume level's prime scales, so each block's output
scale equals its input scale with no relabel error.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

from ..ckks.context import CkksContext
from ..ckks.ciphertext import Ciphertext
from ..models.fully_encrypted import FullyEncryptedFfn
from .sharded_bsgs import ShardedBsgsMatvec

__all__ = ["ShardedFullyEncryptedFfn"]


class ShardedFullyEncryptedFfn:
    """One fully-encrypted block (x + (x @ W_key)^2 @ W_val, 3 levels)
    with chunk matvecs giant-sharded over mesh axis `axis`."""

    def __init__(self, ctx: CkksContext, d: int, f: int, mesh: Mesh,
                 axis: str = "giant"):
        self.ctx = ctx
        self.d, self.f = d, f
        self.mesh = mesh
        self.eng = ShardedBsgsMatvec(ctx, d, mesh, axis)
        self.n_chunks = -(-f // d)
        # exact-scale bookkeeping shared with the single-chip engine
        self.diag_scales = FullyEncryptedFfn.diag_scales.__get__(self)

    def encode_block(self, w_key: np.ndarray, w_val: np.ndarray,
                     level: int) -> dict:
        """Host pre-encode at the exact-alignment scales for `level` (the
        level the block is consumed at); per-chunk EncodedDiagonals."""
        d, enc = self.d, self.eng.encode
        s_key, s_val = self.diag_scales(level)
        keys, vals = [], []
        for c in range(self.n_chunks):
            mk = np.zeros((d, d))
            cols = w_key[:, c * d: (c + 1) * d].T
            mk[: cols.shape[0]] = cols
            keys.append(enc(mk, s_key))
            mv = np.zeros((d, d))
            rows = w_val[c * d: (c + 1) * d, :].T
            mv[:, : rows.shape[1]] = rows
            vals.append(enc(mv, s_val))
        return {"key": keys, "val": vals, "level": level}

    def load_block(self, host: dict, level: int) -> dict:
        """Stage diagonals sharded over the giant axis, at the levels they
        are consumed: key at `level`, val at `level - 2`."""
        assert host["level"] == level, (host["level"], level)
        return {"key": [self.eng.load(e, level) for e in host["key"]],
                "val": [self.eng.load(e, level - 2) for e in host["val"]],
                "level": level}

    def __call__(self, ct_x: Ciphertext, staged: dict) -> Ciphertext:
        ctx, l = self.ctx, ct_x.level
        assert l >= 4, f"need >= 4 limbs, have {l} (bootstrap first)"
        assert staged["level"] == l, (staged["level"], l)
        s_key, s_val = self.diag_scales(l)
        # 1. key projection: per-chunk sharded matvecs  [1 level]
        fks = [self.eng(ct_x, pt, pt_scale=s_key) for pt in staged["key"]]
        # 2. square per chunk  [1 level]
        sqs = [ctx.rescale(ctx.multiply(c, c)) for c in fks]
        # 3. value projection + chunk sum  [1 level]
        fvs = [self.eng(sq, pt, pt_scale=s_val)
               for sq, pt in zip(sqs, staged["val"])]
        v = fvs[0]
        for c in fvs[1:]:
            v = ctx.add(v, c)
        # 4. residual at equal true scales (s_fv = s_x^2/Delta = s_x under
        # the chain invariant s_x = Delta) — unify float tags and add
        x_al = ctx.mod_drop(ct_x, 3)
        return ctx.add(ctx.set_scale(x_al, v.scale), v)

    def run_chain(self, w_keys, w_vals, x0, verbose: bool = False):
        """Chain blocks with per-block plaintext verification (the sharded
        analogue of models.fully_encrypted.run_fully_encrypted)."""
        from ..models.fully_encrypted import plaintext_ffn_block

        ctx = self.ctx
        x_ref = np.asarray(x0, dtype=np.float64).copy()
        ct = ctx.encrypt_replicated(x0)
        stats = []
        for b, (wk, wv) in enumerate(zip(w_keys, w_vals)):
            if ct.level - 1 < 4:
                break
            host = self.encode_block(np.asarray(wk), np.asarray(wv),
                                     level=ct.level)
            ct = self(ct, self.load_block(host, ct.level))
            jax.block_until_ready(ct.c)
            x_ref = plaintext_ffn_block(x_ref, np.asarray(wk),
                                        np.asarray(wv))
            dec = ctx.decrypt_vec(ct, self.d)
            corr = float(np.corrcoef(dec, x_ref)[0, 1])
            err = float(np.max(np.abs(dec - x_ref)))
            stats.append({"block": b, "corr": corr, "max_err": err,
                          "level": ct.level})
            if verbose:
                print(f"  sharded block {b}: corr={corr:.10f} "
                      f"max_err={err:.2e} level={ct.level}")
        return stats, ct
