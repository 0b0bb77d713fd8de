"""Multi-host block pipeline for client-aided generation (DCN scaling).

DESIGN.md §15 upgraded from a note to a runnable prototype: the
production device-client token (models/device_client.py) partitioned
over a mesh axis of HOSTS — each host owns a contiguous span of RWKV
blocks (its pre-encoded diagonals, client weights, and per-block WKV
state never leave the host), and S independent streams flow through the
hosts GPipe-style.  The ONLY cross-host traffic is the residual-stream
handoff at span boundaries: (x, v_first, block counter) — two f32[D]
vectors (~16 KB at D=2048) per boundary per token, 3-4 orders of
magnitude below the intra-host collective volume of the giant/limb
sharding, so this is the partition that rides DCN (the outer mesh axis)
while the per-projection sharding rides ICI (inner axes).

Schedule: macro-step t, host h works on stream s = t - h (fill/drain
steps are masked); after every step the (x, v_first, bi) ring advances
one host via lax.ppermute.  T = S + H - 1 steps advance all S streams by
one full token.  The whole pipeline — all hosts, all steps — is ONE
jitted shard_map dispatch.

The reference is single-GPU (SURVEY.md §2: no distributed code of any
kind); this subsystem is mandated by BASELINE.json's scale-out
north star.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models.device_client import DeviceTokenRunner
from ..models.rwkv7 import RwkvState, layer_norm

__all__ = ["BlockPipeline"]


class BlockPipeline:
    """Pipelined multi-stream token steps over a 'block' mesh axis."""

    def __init__(self, runner: DeviceTokenRunner, mesh: Mesh,
                 axis: str = "block"):
        self.runner = runner
        self.mesh = mesh
        self.axis = axis
        self.H = mesh.shape[axis]
        self.nb = len(runner.model.blocks)
        assert self.nb % self.H == 0, (self.nb, self.H)
        self.span = self.nb // self.H
        self._fn_cache = {}

    # -- the pipelined step over all hosts ---------------------------------

    def _pipe_fn(self, S: int):
        if S in self._fn_cache:
            return self._fn_cache[S]
        runner, H, span, ax = self.runner, self.H, self.span, self.axis
        d = runner.d
        n_xs = len(runner.eng._xs(runner.level))

        def pipe(fresh, seeds, xpa, xpf, st, pts, cw, *xs):
            # local views: fresh [S, d] / seeds [S] replicated; xpa/xpf
            # [S, span, d], st [S, span, heads, hs, hs], pts/cw leading
            # dim span — all sharded on the block axis.
            hidx = lax.axis_index(ax)
            body = runner._block_body(xs)
            T = S + H - 1

            def step(carry, t):
                (x, vf, bi), xpa, xpf, st = carry
                s_act = t - hidx
                valid = (s_act >= 0) & (s_act < S)
                s_c = jnp.clip(s_act, 0, S - 1)
                # host 0 starts stream t at step t
                start = hidx == 0
                x = jnp.where(start, fresh[s_c], x)
                vf = jnp.where(start, jnp.zeros_like(vf), vf)
                bi = jnp.where(start, jnp.int32(0), bi)
                # per-(stream, host) fresh encryption randomness
                keys = jax.random.split(
                    jax.random.fold_in(
                        jax.random.PRNGKey(seeds[s_c]), hidx), (span, 4))
                aux = (xpa[s_c], xpf[s_c], st[s_c])
                (x2, vf2, bi2), (xpa_n, xpf_n, st_n) = lax.scan(
                    body, (x, vf, bi), (cw, pts, aux, keys))
                upd = lambda A, An: A.at[s_c].set(
                    jnp.where(valid, An, A[s_c]))
                xpa, xpf, st = upd(xpa, xpa_n), upd(xpf, xpf_n), upd(st, st_n)
                y = x2                               # host H-1 => stream out
                perm = [(i, (i + 1) % H) for i in range(H)]
                ring = tuple(lax.ppermute(v, ax, perm) for v in
                             (x2, vf2, bi2))
                return (ring, xpa, xpf, st), y

            ring0 = (jnp.zeros(d, jnp.float32), jnp.zeros(d, jnp.float32),
                     jnp.int32(0))
            (_, xpa, xpf, st), ys = lax.scan(
                step, (ring0, xpa, xpf, st), jnp.arange(T))
            return ys[None], xpa, xpf, st            # ys local [1, T, d]

        f = shard_map(
            pipe, mesh=self.mesh,
            in_specs=(P(), P(), P(None, ax), P(None, ax), P(None, ax),
                      (P(ax),) * 4, (P(ax),) * len(runner.cw))
            + (P(),) * n_xs,
            out_specs=(P(ax, None, None), P(None, ax), P(None, ax),
                       P(None, ax)),
            check_vma=False)
        jf = jax.jit(f)
        self._fn_cache[S] = jf
        return jf

    # -- public API ---------------------------------------------------------

    def generate_tokens(self, token_ids, states):
        """Advance S = len(token_ids) independent streams by one token
        each, pipelined across the block-axis hosts (ONE dispatch).
        Returns (logits [S, vocab], new_states)."""
        r = self.runner
        m = r.model
        S = len(token_ids)
        fresh = np.stack([
            layer_norm(np.asarray(m.emb[t], dtype=np.float64), m.ln0_w,
                       m.ln0_b).astype(np.float32) for t in token_ids])
        r._seed += 1
        seeds = (np.uint32(r._seed & 0xFFFFFFFF)
                 + np.arange(S, dtype=np.uint32) * np.uint32(0x9E3779B9))
        xpa = np.stack([np.stack(s.x_prev_att) for s in states]
                       ).astype(np.float32)
        xpf = np.stack([np.stack(s.x_prev_ffn) for s in states]
                       ).astype(np.float32)
        st = np.stack([np.stack(s.wkv) for s in states]).astype(np.float32)
        pts = (r.pt["rkv"], r.pt["o"], r.pt["fk"], r.pt["fv"])
        cw = tuple(r.cw[nm] for nm in r.cw)
        ys, xpa_n, xpf_n, st_n = self._pipe_fn(S)(
            fresh, seeds, xpa, xpf, st, pts, cw, *r.eng._xs(r.level))
        ys = np.asarray(ys, dtype=np.float64)        # [H, T, d]
        xpa_n = np.asarray(xpa_n, dtype=np.float64)
        xpf_n = np.asarray(xpf_n, dtype=np.float64)
        st_n = np.asarray(st_n, dtype=np.float64)
        news = [RwkvState(x_prev_att=list(xpa_n[s]),
                          x_prev_ffn=list(xpf_n[s]), wkv=list(st_n[s]))
                for s in range(S)]
        # stream s exits the last host at macro-step s + H - 1
        x_out = np.stack([ys[self.H - 1, s + self.H - 1] for s in range(S)])
        logits = (np.stack([layer_norm(x, m.ln_out_w, m.ln_out_b)
                            for x in x_out]) @ m.head_w)
        return logits, news
