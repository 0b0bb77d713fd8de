"""Naive (non-BSGS) fully-encrypted inference primitives — the ablation
baseline (SURVEY.md C4/C5, /root/reference/fhe_rwkv_inference.py).

These are the per-column rotate-and-sum kernels the reference used before
BSGS (README.md:62: ~30x slower; paper/main.tex:983: 10,863 s for one
2048x8192 block).  Kept for parity and as the ablation that motivates the
BSGS engine (89 rotations vs 22,528 at D=2048, paper/main.tex:1045).

TPU-first deviation: the per-column loop is batched — all output columns'
mult_plain run as one [cols, ...] tensor op, and the log2(d) rotate-and-sum
tree uses one hoisted multi-rotation per level across the whole batch.
"""

from __future__ import annotations

import numpy as np

from ..ckks.context import CkksContext
from ..ckks.ciphertext import Ciphertext, Plaintext

__all__ = ["ct_pt_dot", "ct_pt_weighted_sum", "naive_matvec",
           "naive_ffn_block", "rotation_count_naive",
           "naive_multilayer", "naive_autoregressive"]


def rotation_count_naive(d_in: int, d_out: int) -> int:
    """Rotations for the naive path: d_out * log2(d_in) (ablation metric)."""
    return d_out * int(np.ceil(np.log2(d_in)))


def ct_pt_dot(ctx: CkksContext, ct: Ciphertext, w: np.ndarray, d: int
              ) -> Ciphertext:
    """<ct, w> via mult_plain + ceil(log2 d) rotate-and-sum; the dot product
    lands in slot 0 (read with decrypt_slot0, fhe_rwkv_inference.py:66-76).
    Consumes one level."""
    steps = [1 << k for k in range(int(np.ceil(np.log2(d))))]
    ctx.ensure_galois(steps)
    wv = np.zeros(ctx.slots)
    wv[:d] = w
    pt = ctx.encode(wv, level=ct.level)
    acc = ctx.mul_plain(ct, pt)
    for s in steps:
        acc = ctx.add(acc, ctx.rotate(acc, s))
    return ctx.rescale(acc)


def ct_pt_weighted_sum(ctx: CkksContext, cts: list[Ciphertext],
                       weights: np.ndarray, level: int | None = None
                       ) -> Ciphertext:
    """sum_j w_j * ct_j with explicit level alignment
    (fhe_rwkv_inference.py:79-94).  Scalar multiplies are direct RNS
    constants (ctx.mul_scalar) — no encoding."""
    level = min(c.level for c in cts) if level is None else level
    acc = None
    for ct, w in zip(cts, weights):
        t = ctx.rescale(ctx.mul_scalar(ctx.mod_switch_to(ct, level), float(w)))
        acc = t if acc is None else ctx.add(acc, t)
    return acc


def naive_matvec(ctx: CkksContext, ct: Ciphertext, w: np.ndarray,
                 d_in: int, d_out: int | None = None) -> np.ndarray:
    """Per-column dots, decrypting slot 0 of each (the reference's
    fhe_projection, scripts/bootstrap_generation.py:745-753).  Batched over
    columns: one [cols, ...] mult_plain + shared rotation tree."""
    d_out = w.shape[1] if d_out is None else d_out
    steps = [1 << k for k in range(int(np.ceil(np.log2(d_in))))]
    ctx.ensure_galois(steps)
    cols = np.zeros((d_out, ctx.slots))
    cols[:, :d_in] = w[:d_in, :d_out].T
    pt = ctx.encode(cols, level=ct.level)
    acc = ctx.mul_plain(ct, Plaintext(pt.p[:, None], pt.scale))  # [d_out,...]
    for s in steps:
        acc = ctx.add(acc, ctx.rotate(acc, s))
    out = ctx.rescale(acc)
    return ctx.decrypt_vec(out)[..., 0]


def naive_ffn_block(ctx: CkksContext, x: np.ndarray, w_key: np.ndarray,
                    w_val: np.ndarray) -> np.ndarray:
    """One naive fully-encrypted FFN block x + (x@Wk)^2 @ Wv with
    per-column dots and a client square in between — the ablation path of
    run_inference (fhe_rwkv_inference.py:111-166)."""
    d, f = w_key.shape
    ct = ctx.encrypt_replicated(x)
    fk = naive_matvec(ctx, ct, w_key, d, f)
    fk2 = fk ** 2
    ct2 = ctx.encrypt_replicated(fk2 if f <= ctx.slots else fk2[: ctx.slots])
    fv = naive_matvec(ctx, ct2, w_val, f, d)
    return x + fv


# ---------------------------------------------------------------------------
# C5 ablation chains (fhe_rwkv_inference.py:169-480): multilayer, residual,
# autoregressive — per-dimension scalar-ciphertext arithmetic, batched
# ---------------------------------------------------------------------------

def _scalar_consts(ctx, w: np.ndarray, level: int):
    """Direct-RNS constant residues for a weight matrix: [dout, din, l, 1]
    uint32 Montgomery encodings of round(w * scale) (vectorized
    mul_scalar; fhe_rwkv_inference.py's ct_pt_weighted_sum constants)."""
    import jax.numpy as jnp

    v = np.round(np.asarray(w, dtype=np.float64).T * ctx.scale).astype(
        np.int64)                                   # [dout, din]
    q = ctx.q_np[:level].astype(np.int64)
    r = np.array([ctx.primes[i].mont_r for i in range(level)],
                 dtype=np.int64)
    res = (v[..., None] % q) * r % q                # [dout, din, l]
    return jnp.asarray(res.astype(np.uint32)[..., None])


def _ws_batch(ctx, cts, w: np.ndarray):
    """Batched weighted sums: cts [din, 2, l, N] -> [dout, 2, l-1, N],
    out_i = rescale(sum_j w[j, i] * ct_j).  One level."""
    import jax
    import jax.numpy as jnp
    from ..core.modops import mont_mul, add_mod

    l = cts.shape[-2]
    consts = _scalar_consts(ctx, w, l)

    @jax.jit
    def f(c, k):
        p, pinv = ctx._p(l)
        prod = mont_mul(c[None], k[:, :, None], p, pinv)  # [dout,din,2,l,N]
        acc = prod[:, 0]
        for j in range(1, prod.shape[1]):
            acc = add_mod(acc, prod[:, j], p)
        return ctx._rescale_core(acc, l)
    return f(cts, consts)


def naive_multilayer(ctx: CkksContext, x: np.ndarray, blocks, w_head,
                     residual: bool = False):
    """Chained naive FFN inference, depth 3*len(blocks)+1, fully
    encrypted end to end (run_multilayer_inference /
    run_multilayer_residual_inference, fhe_rwkv_inference.py:169-395).

    blocks: [(W_key [d, f], W_val [f, d]), ...].  Returns
    (token, logits, final_level).  The residual variant aligns x down
    with mod-switch + set_scale before each add (reference :287-300)."""
    d = len(x)
    h_ct = ctx.encrypt(np.tile(np.asarray(x)[:, None],
                               (1, ctx.slots)))        # [d, 2, L, N]
    h_scale = h_ct.scale
    for wk, wv in blocks:
        fk = _ws_batch(ctx, h_ct.c, wk)                # [f, 2, l-1, N]
        s1 = h_scale * ctx.scale / float(ctx.q_np[h_ct.level - 1])
        sq = ctx.multiply(Ciphertext(fk, s1), Ciphertext(fk, s1))
        sq = ctx.rescale(sq)                           # [f, 2, l-2, N]
        v = _ws_batch(ctx, sq.c, wv)                   # [d, 2, l-3, N]
        s2 = sq.scale * ctx.scale / float(ctx.q_np[sq.level - 1])
        out = Ciphertext(v, s2)
        if residual:
            x_al = ctx.mod_switch_to(h_ct, out.level)
            out = ctx.add(ctx.set_scale(out, x_al.scale), x_al)
        h_ct = out
        h_scale = h_ct.scale
    logits_ct = Ciphertext(_ws_batch(ctx, h_ct.c, np.asarray(w_head)),
                           h_scale)
    logits = ctx.decrypt_vec(logits_ct)[..., 0]        # slot 0 per row
    return int(np.argmax(logits)), logits, logits_ct.level


def naive_autoregressive(ctx: CkksContext, emb: np.ndarray, blocks, w_head,
                         start_token: int, num_tokens: int,
                         residual: bool = False):
    """Autoregressive naive generation (fhe_rwkv_inference.py:398-480):
    each step encrypts the current token's embedding, runs the encrypted
    chain + encrypted head, decrypts logits for argmax (client), feeds
    the next token back.  Returns (tokens_fhe, tokens_plain)."""
    tok_f = tok_p = start_token
    toks_f, toks_p = [tok_f], [tok_p]
    for _ in range(num_tokens):
        # plaintext twin
        h = emb[tok_p].copy()
        for wk, wv in blocks:
            pre = (h @ wk) ** 2 @ wv
            h = pre + h if residual else pre
        tok_p = int(np.argmax(h @ np.asarray(w_head)))
        toks_p.append(tok_p)
        tok_f, _, _ = naive_multilayer(ctx, emb[tok_f], blocks, w_head,
                                       residual=residual)
        toks_f.append(tok_f)
    return toks_f, toks_p
