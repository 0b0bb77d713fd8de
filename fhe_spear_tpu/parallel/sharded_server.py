"""Client-aided RWKV server with every projection sharded over a mesh.

Drop-in replacement for models.client_aided.FheRwkvServer (classic
Ciphertext transport): the four protocol projections — r/k/v batch, W_o,
FFN-key chunk pairs, FFN-value chunk pairs — evaluate through the
giant-sharded BSGS kernel (parallel/sharded_bsgs.ShardedBsgsMatvec),
partial sums reduced with the exact modular psum over the mesh axis.

This is the production-path counterpart of the standalone sharded matvec
demo: FheRwkvClient drives it unchanged, so one token runs the full
4-round-trip x n_blocks protocol with all server compute sharded
(SURVEY.md §2 parallelism mandate; no reference counterpart — the
reference is single-GPU).  Results agree with the single-chip server to
keyswitch-noise tolerance; the modular arithmetic itself is exact
(psum_mod), so the only divergence source is the identity-keyswitch of
giant group 0 (see sharded_bsgs module docstring).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ckks.context import CkksContext
from ..ckks.ciphertext import Ciphertext
from ..models.client_aided import FheRwkvServer
from ..models.rwkv7 import RwkvModel
from .sharded_bsgs import ShardedBsgsMatvec

__all__ = ["ShardedFheRwkvServer"]


class ShardedFheRwkvServer(FheRwkvServer):
    def __init__(self, ctx: CkksContext, model: RwkvModel, mesh: Mesh,
                 level: int = 3, axis: str = "giant", **kw):
        kw.setdefault("stage_mode", "expanded")
        super().__init__(ctx, model, level=level, **kw)
        self.mesh = mesh
        self.axis = axis
        self.sharded = ShardedBsgsMatvec(ctx, self.d, mesh, axis=axis)

    def load_block(self, i: int) -> dict:
        """Stage the block's diagonal stacks sharded on the giant axis
        (leading matrix axes replicated)."""
        if i in self._device:
            return self._device[i]
        staged = super().load_block(i)
        out = {}
        for k, v in staged.items():
            lead = v.ndim - 4            # stacked matrix axes before [B,G,l,N]
            spec = P(*((None,) * lead + (self.axis,)))
            out[k] = jax.device_put(v, NamedSharding(self.mesh, spec))
        self._device[i] = out
        return out

    # -- projections: per-matrix sharded kernels ---------------------------

    def _sharded_one(self, c, pt):
        return self.sharded._kernel(self.level)(c, pt)

    def project_rkv(self, i: int, ct3: Ciphertext) -> Ciphertext:
        pt = self.load_block(i)["rkv"]                   # [3, B, G, l, N]
        outs = [self._sharded_one(ct3.c[k], pt[k]) for k in range(3)]
        return Ciphertext(jnp.stack(outs), self._out_scale(ct3))

    def project_o(self, i: int, ct: Ciphertext) -> Ciphertext:
        pt = self.load_block(i)["o"]
        return Ciphertext(self._sharded_one(ct.c, pt), self._out_scale(ct))

    def project_ffn_key(self, i: int, ct: Ciphertext) -> Ciphertext:
        pt = self.load_block(i)["ffn_key"]               # [Pairs, B, G, l, N]
        outs = [self._sharded_one(ct.c, pt[k]) for k in range(pt.shape[0])]
        return Ciphertext(jnp.stack(outs), self._out_scale(ct))

    def project_ffn_val(self, i: int, ct_pairs: Ciphertext) -> Ciphertext:
        pt = self.load_block(i)["ffn_val"]
        outs = [self._sharded_one(ct_pairs.c[k], pt[k])
                for k in range(pt.shape[0])]
        return Ciphertext(jnp.stack(outs), self._out_scale(ct_pairs))
