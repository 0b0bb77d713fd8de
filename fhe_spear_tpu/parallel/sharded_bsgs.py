"""Multi-chip BSGS matvec: giant-step groups sharded over a device mesh.

The BSGS evaluation y = sum_g rot_{gG}( sum_b diag'_{gG+b} * rot_b(x) ) is
data-parallel over giant groups g: each device holds the pre-encoded
diagonals and rotation key for its own group(s), computes the baby-step
contraction + giant rotation locally, and the partial results are reduced
with an exact modular psum over ICI (parallel/collectives.psum_mod).  This
is the "giant-step reductions via collectives" design mandated by
BASELINE.json (no counterpart in the single-GPU reference — SURVEY.md §2).

Group g=0 needs no rotation; to keep the shard_map body uniform across
devices it uses the identity keyswitch key (s -> s), which costs one
keyswitch of noise and removes all cross-device control flow.

Layout: mesh axis "giant" of size n_dev with B % n_dev == 0; stacked
arrays [B, ...] are sharded on their leading axis, the input ciphertext
and baby-rotation keys are replicated.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax import shard_map

from ..core.modops import mont_mul, add_mod
from ..core.ntt import automorphism_perm
from ..ckks.context import CkksContext
from ..ckks.ciphertext import Ciphertext
from ..ops.bsgs import BsgsMatvec, bsgs_dims
from .collectives import psum_mod, make_shift16_const

__all__ = ["ShardedBsgsMatvec"]


class ShardedBsgsMatvec:
    """BSGS matvec with giant groups sharded over mesh axis `axis`."""

    def __init__(self, ctx: CkksContext, d: int, mesh: Mesh,
                 axis: str = "giant"):
        self.ctx = ctx
        self.d = d
        self.mesh = mesh
        self.axis = axis
        self.G, self.B = bsgs_dims(d)
        n_dev = mesh.shape[axis]
        assert self.B % n_dev == 0, (self.B, n_dev)
        self.eng = BsgsMatvec(ctx, d)          # host encode + galois keys
        ctx.identity_ksk()                     # ensure the s -> s key exists
        self._shift16 = make_shift16_const(ctx.primes)

    def encode(self, w, scale=None):
        return self.eng.encode(w, scale)

    def load(self, enc, level):
        pt = self.eng.load(enc, level)          # [B, G, l, N]
        return jax.device_put(
            pt, NamedSharding(self.mesh, P(self.axis)))

    def __call__(self, ct: Ciphertext, pt: jnp.ndarray,
                 pt_scale: float | None = None) -> Ciphertext:
        l = ct.level
        scale = self.ctx.scale if pt_scale is None else pt_scale
        out = self._kernel(l)(ct.c, pt)
        return Ciphertext(out, ct.scale * scale / float(self.ctx.q_np[l - 1]))

    @functools.lru_cache(maxsize=None)
    def _kernel(self, l: int):
        ctx = self.ctx
        n = ctx.n
        p, pinv = ctx._p(l)
        sh16 = self._shift16[:l]

        def stack_keys(steps, with_identity=False):
            gs = [ctx.galois_element(s) for s in steps]
            perms = np.stack([ctx.ntt.autoperm(g) for g in gs]
                             ).astype(np.int32)
            keys = [(ctx.identity_ksk() if g == 1 else ctx.galois_keys[g])
                    for g in gs]
            kb, ka = zip(*(ctx.select_key(k, l) for k in keys))
            # jitted stack: eager concatenate is unimplemented on the tunnel
            kbs, kas = jax.jit(
                lambda bs, as_: (jnp.stack(bs), jnp.stack(as_)))(
                    list(kb), list(ka))
            return (jnp.asarray(perms), kbs, kas)

        baby_xs = (stack_keys(range(1, self.G)) if self.G > 1
                   else (jnp.zeros((0, n), jnp.int32),) * 3)
        # all B giant steps, including g=0 via the identity key
        giant_xs = stack_keys([g * self.G for g in range(self.B)])

        def rotate_with(c, D1, perm, kb, ka):
            Dg = jnp.take(D1, perm, axis=-1)
            ks = ctx._mod_down(ctx._apply_ksk(Dg, kb, ka, l), l)
            c0 = add_mod(jnp.take(c[..., 0, :, :], perm, axis=-1),
                         ks[..., 0, :, :], p)
            return jnp.stack([c0, ks[..., 1, :, :]], axis=-3)

        def contract(babies, ptg):
            prod = mont_mul(babies, ptg[:, None], p, ctx.ntt.pinv[:l])
            while prod.shape[0] > 1:
                m = prod.shape[0]
                if m % 2:
                    head, prod = prod[:1], prod[1:]
                    prod = prod.at[0].set(add_mod(prod[0], head[0], p))
                    m -= 1
                prod = add_mod(prod[: m // 2], prod[m // 2:], p)
            return prod[0]

        def tree_sum(s):
            while s.shape[0] > 1:
                m = s.shape[0]
                if m % 2:
                    s = s.at[0].set(add_mod(s[0], s[m - 1], p))
                    s = s[: m - 1]
                    m -= 1
                s = add_mod(s[: m // 2], s[m // 2:], p)
            return s[0]

        def body(c, pt_l, bp, bkb, bka, gperm_l, gkb_l, gka_l):
            # replicated: hoisted baby rotations as ONE batched keyswitch
            # (the round-3 kernel restructure, docs/NOTES_r3.md: the
            # original lax.scan ran one latency-bound step per key)
            D1 = ctx._decompose(c[..., 1, :, :], l)
            if self.G > 1:
                rot = jax.vmap(
                    lambda perm, kb, ka: rotate_with(c, D1, perm, kb, ka)
                )(bp, bkb, bka)
                babies = jnp.concatenate([c[None], rot])
            else:
                babies = c[None]

            # local giant groups, all in one batch: contraction, digit
            # decomposition, and keyswitch are each a single batched op
            accs = jax.vmap(lambda ptg: contract(babies, ptg))(pt_l)
            D2 = ctx._decompose(accs[..., 1, :, :], l)
            rots = jax.vmap(rotate_with)(accs, D2, gperm_l, gkb_l, gka_l)
            y = tree_sum(rots)
            # modular all-reduce over the giant axis, then rescale
            y = psum_mod(y, self.axis, p, pinv, sh16)
            return ctx._rescale_core(y, l)

        ax = self.axis
        f = shard_map(
            body, mesh=self.mesh,
            in_specs=(P(), P(ax), P(), P(), P(), P(ax), P(ax), P(ax)),
            out_specs=P(),
            check_vma=False,
        )

        def kernel(c, pt):
            # keys passed as runtime args (replicated baby keys, sharded
            # giant keys) — not HLO constants
            return f(c, pt, *baby_xs, *giant_xs)
        return jax.jit(kernel)
