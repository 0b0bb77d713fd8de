"""Single-dispatch client-aided token pipeline (device-resident client).

The classic transport (models/client_aided.py) runs the client role on the
host: 4 encode/encrypt -> server-kernel -> decrypt/decode round trips per
block, 96 device dispatches per 24-block token, with host FFT encodes and
the WKV-7 recurrence in numpy between them.  On a remote TPU every
dispatch is a tunnel round trip and the host CPU is weak, so the measured
steady state is latency-bound, not compute-bound (docs/NOTES_r1.md: ~25 ms
VPU compute inside 0.46-0.74 s/block wall).

This module keeps the SAME protocol algebra — every value that crosses the
client/server boundary is still encrypted with fresh threefry randomness,
the server math operates exclusively on ciphertexts and pre-encoded
diagonals, decryption uses the secret key exactly where the protocol says
the client would — but executes the client role on the device too, in
float32, and fuses the whole token (all blocks x 4 round trips) into ONE
jitted lax.scan.  One dispatch per token.

Design points:
  * Encode/decode are the canonical-embedding FFTs evaluated on-device in
    complex64 (XLA FFT).  f32 encode rounding (~1e-6 relative) is
    additional benign encryption noise, orders below the magnitudes that
    affect token selection.
  * Single-limb decryption: server diagonals are pre-scaled by 1/PRESCALE
    so every projection output magnitude stays below q0/(2*Delta_out);
    the client multiplies PRESCALE back after decoding (exact plaintext
    bookkeeping).  This keeps decryption free of uint64 CRT, which f32
    cannot represent.
  * The WKV-7 recurrence, gates, GroupNorm, and ReLU^2 are jnp float32
    ports of the numpy oracle (models/rwkv7.py).
  * Verified token-exact vs the float64 plaintext oracle at test scale
    (tests/test_device_client.py).

Reference parity: this is a TPU-native replacement for the round-trip
loop of client_aided_block (/root/reference/scripts/bootstrap_generation
.py:756-897); the reference has no analog (its client is host CUDA-free
Python, its server local CUDA — the latency problem this solves is
specific to accelerator-offload deployments).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ckks.context import CkksContext
from ..core.modops import mont_mul, add_mod, neg_mod, barrett_reduce
from ..ops.bsgs import BsgsMatvec, rns_expand
from .rwkv7 import RwkvModel, RwkvState, layer_norm, generate_token_plaintext
from .client_aided import _chunk_pairs

__all__ = ["DeviceTokenRunner", "run_generation_device"]

PRESCALE = 8.0  # folded out of the diagonals; bounds outputs for 1-limb dec


class DeviceTokenRunner:
    def __init__(self, ctx: CkksContext, model: RwkvModel, level: int = 3,
                 cache_dir: str | None = None):
        self.ctx = ctx
        self.model = model
        self.level = level
        d, f = model.d, model.blocks[0].f
        self.d, self.f = d, f
        self.eng = BsgsMatvec(ctx, d)
        self.n_chunks = -(-f // d)
        self.key_pairs = _chunk_pairs(self.n_chunks)
        self.P = len(self.key_pairs)
        self._build_server_stacks(cache_dir)
        self._build_client_stacks()
        self._build_tables()
        # entropy-derived base seed (deterministic only for seeded contexts)
        self._seed = int(ctx.rng.randint(0, 1 << 62, dtype=np.int64))
        self._token_fn = None
        self._stream_fn = None

    # -- server-side pre-encoding (diagonals / PRESCALE, i32-resident) ----

    def _build_server_stacks(self, cache_dir):
        import hashlib
        import os

        enc = self.eng.encode
        d = self.d
        # the cached bytes are encodings OF THE WEIGHTS: key them by a
        # weight fingerprint so a rebuilt/changed model can never silently
        # reuse another model's diagonals (the ADVICE r3 #4 silent-reuse
        # class; bench_fully_enc had exactly this bug via its calibration
        # input — docs/NOTES_r4.md)
        def block_hash(blk):
            # hash every tensor this builder encodes for the block — a
            # model differing in ANY of them (middle blocks included,
            # ADVICE r4 #2) must miss the cache
            h = hashlib.sha1()
            for w in (blk.W_r, blk.W_k, blk.W_v, blk.W_o,
                      blk.W_key_ffn, blk.W_val_ffn):
                h.update(np.ascontiguousarray(w).tobytes())
            return h.hexdigest()[:8]

        stacks = {"rkv": [], "o": [], "fk": [], "fv": []}
        for bi, blk in enumerate(self.model.blocks):
            mh = block_hash(blk)
            bdir = (os.path.join(cache_dir,
                                 f"dc{bi}_{d}_{self.f}_{self.ctx.n}_{mh}")
                    if cache_dir else None)
            names = list(stacks.keys())
            if bdir and all(os.path.exists(os.path.join(bdir, k + ".npy"))
                            for k in names):
                for k in names:
                    stacks[k].append(np.load(os.path.join(bdir, k + ".npy"),
                                             mmap_mode="r"))
                continue
            one = {}
            one["rkv"] = np.stack([
                enc(blk.W_r.T / PRESCALE).coeffs,
                enc(blk.W_k.T / PRESCALE).coeffs,
                enc(blk.W_v.T / PRESCALE).coeffs])
            one["o"] = enc(blk.W_o.T / PRESCALE).coeffs
            fk_mats, fv_mats = [], []
            for c0, c1 in self.key_pairs:
                m0 = self._out_chunk(blk.W_key_ffn, c0)
                m1 = (self._out_chunk(blk.W_key_ffn, c1)
                      if c1 is not None else 0.0)
                fk_mats.append(enc((m0 + 1j * np.asarray(m1)) / PRESCALE
                                   ).coeffs)
                m0 = self._in_chunk(blk.W_val_ffn, c0)
                m1 = (self._in_chunk(blk.W_val_ffn, c1)
                      if c1 is not None else 0.0)
                fv_mats.append(enc((m0 - 1j * np.asarray(m1)) / PRESCALE
                                   ).coeffs)
            one["fk"] = np.stack(fk_mats)
            one["fv"] = np.stack(fv_mats)
            if bdir:
                os.makedirs(bdir, exist_ok=True)
                for k in names:
                    np.save(os.path.join(bdir, k + ".npy"), one[k])
            for k in names:
                stacks[k].append(one[k])
        # device-resident int32 stacks [nb, ...]
        self.pt = {k: jnp.asarray(np.stack(v)) for k, v in stacks.items()}

    def _out_chunk(self, w, c):
        d = self.d
        m = np.zeros((d, d))
        cols = w[:, c * d: (c + 1) * d].T
        m[: cols.shape[0]] = cols
        return m

    def _in_chunk(self, w, c):
        d = self.d
        m = np.zeros((d, d))
        rows = w[c * d: (c + 1) * d, :].T
        m[:, : rows.shape[1]] = rows
        return m

    # -- client weights stacked over blocks, f32 ---------------------------

    def _build_client_stacks(self):
        fields = ["ln1_w", "ln1_b", "ln2_w", "ln2_b", "ln_x_w", "ln_x_b",
                  "x_r", "x_k", "x_v", "x_g", "x_w", "x_a", "x_k_ffn",
                  "w0", "w1", "w2", "a0", "a1", "a2", "v0", "v1", "v2",
                  "g1", "g2", "k_k", "k_a", "r_k"]
        self.cw = {
            name: jnp.asarray(np.stack(
                [np.asarray(getattr(b, name), dtype=np.float32)
                 for b in self.model.blocks]))
            for name in fields}

    # -- encoder tables (device FFT encode/decode) -------------------------

    def _build_tables(self):
        ctx = self.ctx
        enc = ctx.encoder
        n = ctx.n
        # keep every table as a HOST numpy array: complex64 device arrays
        # cannot cross the axon-tunnel boundary (D2H copies and the
        # closure-constant embedding jit does at trace time are both
        # UNIMPLEMENTED; complex compute inside jit is fine), so the
        # zeta twists are stored as f32 re/im and recombined on device
        self._t_slot = np.asarray(enc._t_slot, dtype=np.int32)
        self._t_conj = np.asarray(enc._t_conj, dtype=np.int32)
        self._zeta_re = np.real(enc._zeta_pow).astype(np.float32)
        self._zeta_im = np.imag(enc._zeta_pow).astype(np.float32)
        self._zeta_inv_re = np.real(enc._zeta_pow_inv).astype(np.float32)
        self._zeta_inv_im = np.imag(enc._zeta_pow_inv).astype(np.float32)
        l = self.level
        q = ctx.q_np[:l]
        self._t32r = jnp.asarray(np.array(
            [(1 << 32) % int(q[i]) * ctx.primes[i].mont_r % int(q[i])
             for i in range(l)], dtype=np.uint64).astype(np.uint32)[:, None])
        self._q0 = int(ctx.q_np[0])
        self._out_scale = float(ctx.scale) * float(ctx.scale) / float(
            ctx.q_np[l - 1])

    # -- device-side crypto helpers (used inside the jitted token fn) ------

    def _encode_dev(self, z):
        """complex64 slot rows [..., slots] -> int32 coefficients
        [..., N] at ctx.scale (canonical embedding, on-device FFT)."""
        ctx = self.ctx
        n = ctx.n
        vals = jnp.zeros(z.shape[:-1] + (n,), dtype=jnp.complex64)
        vals = vals.at[..., self._t_slot].set(z)
        vals = vals.at[..., self._t_conj].set(jnp.conj(z))
        b = jnp.fft.fft(vals, axis=-1) / n
        zeta_inv = jax.lax.complex(jnp.asarray(self._zeta_inv_re),
                                   jnp.asarray(self._zeta_inv_im))
        coeffs = jnp.real(b * zeta_inv) * jnp.float32(ctx.scale)
        return jnp.round(coeffs).astype(jnp.int32)

    def _decode_dev(self, coeffs_f32):
        """f32 coefficient rows [..., N] (already divided by out scale) ->
        complex64 slots."""
        n = self.ctx.n
        zeta = jax.lax.complex(jnp.asarray(self._zeta_re),
                               jnp.asarray(self._zeta_im))
        vals = jnp.fft.ifft(coeffs_f32.astype(jnp.complex64)
                            * zeta, axis=-1) * n
        return vals[..., self._t_slot]

    def _encrypt_dev(self, m_i32, key):
        """int32 coefficients [..., N] -> ciphertext [..., 2, l, N]."""
        ctx = self.ctx
        l = self.level
        p, pinv = ctx._p(l)
        sigma = ctx.params.noise_sigma
        m_eval = rns_expand(ctx, m_i32, l)
        ka, ke = jax.random.split(key)
        shape = m_i32.shape[:-1]
        hi = jax.random.bits(ka, shape + (l, ctx.n), jnp.uint32)
        lo = jax.random.bits(jax.random.fold_in(ka, 1),
                             shape + (l, ctx.n), jnp.uint32)
        h = barrett_reduce(hi, p, ctx.mu[:l])
        a = add_mod(mont_mul(h, self._t32r, p, pinv),
                    barrett_reduce(lo, p, ctx.mu[:l]), p)
        e = jnp.round(jax.random.normal(ke, shape + (ctx.n,)) * sigma
                      ).astype(jnp.int32)
        e_eval = rns_expand(ctx, e, l)
        s = ctx.s_eval[:l]
        c0 = add_mod(add_mod(neg_mod(mont_mul(a, s, p, pinv), p),
                             m_eval, p), e_eval, p)
        return jnp.stack([c0, a], axis=-3)

    def _decrypt_dev(self, out_ct):
        """[..., 2, l-1, N] -> f32 message slot rows [..., slots]
        (single-limb decrypt; |value| < q0/(2*out_scale) by PRESCALE)."""
        ctx = self.ctx
        ntt = ctx.ntt
        p1, pinv1 = ntt.p[:1], ntt.pinv[:1]
        v = add_mod(out_ct[..., 0, :1, :],
                    mont_mul(out_ct[..., 1, :1, :], ctx.s_eval[:1], p1,
                             pinv1), p1)
        t = ntt.from_mont(ntt.intt(v, (0,)), (0,))[..., 0, :]
        q0 = jnp.uint32(self._q0)
        centered = jnp.where(t > q0 // jnp.uint32(2),
                             -(q0 - t).astype(jnp.float32),
                             t.astype(jnp.float32))
        coeffs = centered / jnp.float32(self._out_scale)
        return self._decode_dev(coeffs)

    # -- the fused token step ----------------------------------------------

    def _tile(self, x):
        return jnp.tile(x, (1,) * (x.ndim - 1) + (self.ctx.slots // x.shape[-1],))

    def _project(self, kern, pt_i32, slots_rows, key, shared_ct=False):
        """Encrypt slot rows, run the (batched) BSGS kernel, decrypt."""
        m = self._encode_dev(slots_rows)
        c = self._encrypt_dev(m, key)
        out = kern(c, pt_i32)
        return self._decrypt_dev(out) * jnp.float32(PRESCALE)

    def _block_body(self, xs):
        """body(carry, per_block): the single-block protocol step — all 4
        encrypted round trips plus the device-resident client math.

        carry = (x [d] f32, v_first [d] f32, bi i32); per_block =
        (client-weight tuple, (pt_rkv, pt_o, pt_fk, pt_fv), (xpa, xpf,
        wkv state), keys [4]).  Returns ((x', v_first', bi+1),
        (x_ln, x_ffn_ln, new_state)) — the aux outputs become the next
        token's per-block token-mix/WKV state.  Used by the token scan
        (one jitted dispatch per token) and by the multi-host block
        pipeline (parallel/block_pipeline.py).
        """
        d = self.d
        h = self.model.n_head
        hs = self.model.head_size
        raw = self.eng._kernel_raw(self.level, i32=True)
        kern_b = jax.vmap(raw, in_axes=(0, 0) + (None,) * 6)    # batched
        kern_s = jax.vmap(raw, in_axes=(None, 0) + (None,) * 6)  # shared ct
        cwf = list(self.cw.keys())

        def body(carry, per_block):
            x, v_first, bi = carry
            w = dict(zip(cwf, per_block[0]))
            pt_rkv, pt_o, pt_fk, pt_fv = per_block[1]
            xpa, xpf, state = per_block[2]
            keys = per_block[3]                   # [4] PRNG keys

            def ln(v, wt, bb, eps=1e-5):
                mu = jnp.mean(v, -1, keepdims=True)
                var = jnp.var(v, -1, keepdims=True)
                return (v - mu) / jnp.sqrt(var + eps) * wt + bb

            sig = jax.nn.sigmoid

            x_ln = ln(x, w["ln1_w"], w["ln1_b"])
            xx = xpa - x_ln
            mix = {nm: x_ln + xx * w["x_" + nm]
                   for nm in ("r", "k", "v", "g", "w", "a")}

            # -- round trip 1: r, k, v projections -------------------------
            xs3 = jnp.stack([mix["r"], mix["k"], mix["v"]])
            mag = jnp.maximum(jnp.max(jnp.abs(xs3), -1, keepdims=True), 1e-9)
            rows = self._tile((xs3 / mag).astype(jnp.complex64))
            rkv = self._project(lambda c, p_: kern_b(c, p_, *xs),
                                pt_rkv, rows, keys[0])
            rkv = jnp.real(rkv)[:, :d] * mag
            r, k, v = rkv[0], rkv[1], rkv[2]

            # -- client: WKV-7 recurrence ---------------------------------
            w_vec = sig(w["w0"] + jnp.tanh(mix["w"] @ w["w1"]) @ w["w2"])
            decay = jnp.exp(-jnp.exp(-0.5) * w_vec.reshape(h, hs))
            a_h = sig(w["a0"] + (mix["a"] @ w["a1"]) @ w["a2"]).reshape(h, hs)
            kk = (k * w["k_k"]).reshape(h, hs)
            kk = kk / (jnp.linalg.norm(kk, axis=-1, keepdims=True) + 1e-12)
            k_h = k.reshape(h, hs) * (1.0 + (a_h - 1.0) * w["k_a"].reshape(h, hs))
            v_gate = sig(w["v0"] + (mix["v"] @ w["v1"]) @ w["v2"])
            v_mixed = v + (v_first - v) * v_gate
            v_eff = jnp.where(bi == 0, v, v_mixed)
            v_first = jnp.where(bi == 0, v, v_first)
            v_h = v_eff.reshape(h, hs)
            rh = r.reshape(h, hs)
            sa = jnp.einsum("hij,hj->hi", state, -kk)
            new_state = (state * decay[:, None, :]
                         + sa[:, :, None] * (kk * a_h)[:, None, :]
                         + v_h[:, :, None] * k_h[:, None, :])
            wkv = jnp.einsum("hij,hj->hi", new_state, rh).reshape(h * hs)
            g_ = wkv.reshape(h, hs)
            g_ = (g_ - g_.mean(-1, keepdims=True)) / jnp.sqrt(
                g_.var(-1, keepdims=True) + 64e-5)
            wkv = g_.reshape(h * hs) * w["ln_x_w"] + w["ln_x_b"]
            bonus = (rh * k_h * w["r_k"]).sum(-1, keepdims=True) * v_h
            wkv = wkv + bonus.reshape(h * hs)
            g = sig(mix["g"] @ w["g1"]) @ w["g2"]
            gated = wkv * g

            # -- round trip 2: W_o ----------------------------------------
            mag_g = jnp.maximum(jnp.max(jnp.abs(gated)), 1e-9)
            rows = self._tile((gated / mag_g).astype(jnp.complex64))[None]
            att = self._project(lambda c, p_: kern_b(c, p_[None], *xs),
                                pt_o, rows, keys[1])
            att = jnp.real(att)[0, :d] * mag_g
            x = x + att

            # -- round trip 3: FFN key (complex chunk pairs) --------------
            x_ffn_ln = ln(x, w["ln2_w"], w["ln2_b"])
            xk_ffn = x_ffn_ln + (xpf - x_ffn_ln) * w["x_k_ffn"]
            mag_fk = jnp.maximum(jnp.max(jnp.abs(xk_ffn)), 1e-9)
            rows = self._tile((xk_ffn / mag_fk).astype(jnp.complex64))[None]
            z = self._project(lambda c, p_: kern_s(c[0], p_, *xs),
                              pt_fk, rows, keys[2])      # [P, slots]
            z = z[:, :d] * mag_fk
            # client: unpack pairs -> relu^2 -> repack complex pairs
            fk_re = jnp.maximum(jnp.real(z), 0.0) ** 2    # [P, d]
            fk_im = jnp.maximum(jnp.imag(z), 0.0) ** 2
            zp = fk_re + 1j * fk_im                       # [P, d] complex
            mag_v = jnp.maximum(jnp.maximum(
                jnp.max(jnp.abs(fk_re)), jnp.max(jnp.abs(fk_im))), 1e-9)
            rows = self._tile((zp / mag_v).astype(jnp.complex64))

            # -- round trip 4: FFN value (conjugate trick) ----------------
            zv = self._project(lambda c, p_: kern_b(c, p_, *xs),
                               pt_fv, rows, keys[3])
            v_ffn = jnp.sum(jnp.real(zv)[:, :d], axis=0) * mag_v
            x = x + v_ffn

            return (x, v_first, bi + 1), (x_ln, x_ffn_ln, new_state)
        return body

    def _build_token_fn(self):
        nb = len(self.model.blocks)

        # NOTE: rotation keys (xs) and the stacked client weights are
        # RUNTIME ARGUMENTS — closed-over device arrays would be embedded
        # into the HLO as constants (~100 MB of keys at D=2048), blowing
        # compile time (docs/NOTES_r1.md item 3)

        def token_fn(x0, xpa, xpf, states, seed, pts, cw_stack, *xs):
            # key derivation INSIDE the jit: eager PRNGKey/convert ops are
            # unimplemented over the axon TPU tunnel
            keys = jax.random.split(jax.random.PRNGKey(seed), (nb, 4))
            carry = (x0, jnp.zeros_like(x0), jnp.int32(0))
            (x, _, _), (xpa_n, xpf_n, st_n) = lax.scan(
                self._block_body(xs), carry,
                (cw_stack, pts, (xpa, xpf, states), keys))
            return x, xpa_n, xpf_n, st_n

        return jax.jit(token_fn)

    # -- public API --------------------------------------------------------

    def generate_token(self, token_id: int, state: RwkvState):
        m = self.model
        if self._token_fn is None:
            self._token_fn = self._build_token_fn()
        x = layer_norm(np.asarray(m.emb[token_id], dtype=np.float64),
                       m.ln0_w, m.ln0_b).astype(np.float32)
        self._seed += 1
        seed = np.uint32(self._seed & 0xFFFFFFFF)
        pts = (self.pt["rkv"], self.pt["o"], self.pt["fk"], self.pt["fv"])
        cw_stack = tuple(self.cw[nm] for nm in self.cw)
        # plain numpy args — jit handles the transfer; eager jnp.asarray
        # conversions are unimplemented over the axon tunnel
        xpa = np.stack(state.x_prev_att).astype(np.float32)
        xpf = np.stack(state.x_prev_ffn).astype(np.float32)
        st = np.stack(state.wkv).astype(np.float32)
        x_out, xpa_n, xpf_n, st_n = self._token_fn(
            x, xpa, xpf, st, seed, pts, cw_stack,
            *self.eng._xs(self.level))
        x_out = np.asarray(x_out, dtype=np.float64)
        new = RwkvState(x_prev_att=list(np.asarray(xpa_n, dtype=np.float64)),
                        x_prev_ffn=list(np.asarray(xpf_n, dtype=np.float64)),
                        wkv=list(np.asarray(st_n, dtype=np.float64)))
        logits = layer_norm(x_out, m.ln_out_w, m.ln_out_b) @ m.head_w
        return logits, new

    # -- multi-stream: ONE dispatch advances S independent sequences -------

    def generate_tokens_streams(self, token_ids, states):
        """Batched token step over S independent streams (vmapped over the
        stream axis; server plaintexts, client weights, and rotation keys
        shared).  One dispatch for all streams — the aggregate-throughput
        analog of bench_streams' fused mode.  Returns (logits [S, vocab],
        new_states)."""
        m = self.model
        if self._stream_fn is None:
            self._stream_fn = jax.jit(jax.vmap(
                self._build_token_fn(),
                in_axes=(0, 0, 0, 0, 0, None, None)
                + (None,) * len(self.eng._xs(self.level))))
        xs0 = np.stack([
            layer_norm(np.asarray(m.emb[t], dtype=np.float64), m.ln0_w,
                       m.ln0_b).astype(np.float32) for t in token_ids])
        self._seed += 1
        seeds = (np.uint32(self._seed & 0xFFFFFFFF)
                 + np.arange(len(token_ids), dtype=np.uint32) * np.uint32(
                     0x9E3779B9))
        pts = (self.pt["rkv"], self.pt["o"], self.pt["fk"], self.pt["fv"])
        cw_stack = tuple(self.cw[nm] for nm in self.cw)
        xpa = np.stack([np.stack(s.x_prev_att) for s in states]
                       ).astype(np.float32)
        xpf = np.stack([np.stack(s.x_prev_ffn) for s in states]
                       ).astype(np.float32)
        st = np.stack([np.stack(s.wkv) for s in states]).astype(np.float32)
        x_out, xpa_n, xpf_n, st_n = self._stream_fn(
            xs0, xpa, xpf, st, seeds, pts, cw_stack,
            *self.eng._xs(self.level))
        x_out = np.asarray(x_out, dtype=np.float64)
        xpa_n = np.asarray(xpa_n, dtype=np.float64)
        xpf_n = np.asarray(xpf_n, dtype=np.float64)
        st_n = np.asarray(st_n, dtype=np.float64)
        news = [RwkvState(x_prev_att=list(xpa_n[s]),
                          x_prev_ffn=list(xpf_n[s]), wkv=list(st_n[s]))
                for s in range(len(token_ids))]
        logits = (layer_norm(x_out, m.ln_out_w, m.ln_out_b) @ m.head_w)
        return logits, news


def run_generation_device(ctx, model, seed_tokens, num_tokens,
                          level: int = 3, cache_dir: str | None = None,
                          log_fn=None):
    """Device-client generation with the plaintext twin oracle (same
    verification protocol as client_aided.run_generation)."""
    import time

    t0 = time.perf_counter()
    runner = DeviceTokenRunner(ctx, model, level=level, cache_dir=cache_dir)
    if log_fn:
        log_fn(f"device runner init {time.perf_counter() - t0:.1f}s")

    st_fhe, st_ref = model.zero_state(), model.zero_state()
    for tok in seed_tokens[:-1]:
        _, st_fhe = generate_token_plaintext(model, tok, st_fhe)
        _, st_ref = generate_token_plaintext(model, tok, st_ref)
    tok_fhe = tok_ref = seed_tokens[-1]
    results = []
    for step in range(num_tokens):
        logits_ref, st_ref = generate_token_plaintext(model, tok_ref, st_ref)
        t0 = time.perf_counter()
        logits_fhe, st_fhe = runner.generate_token(tok_fhe, st_fhe)
        dt = time.perf_counter() - t0
        tok_ref = int(np.argmax(logits_ref))
        tok_fhe = int(np.argmax(logits_fhe))
        corr = float(np.corrcoef(logits_fhe, logits_ref)[0, 1])
        results.append({"ref": tok_ref, "fhe": tok_fhe,
                        "match": tok_ref == tok_fhe, "corr": corr,
                        "sec": dt})
        if log_fn:
            log_fn(f"token {step}: ref={tok_ref} fhe={tok_fhe} "
                   f"match={tok_ref == tok_fhe} corr={corr:.6f} {dt:.2f}s")
    return results
