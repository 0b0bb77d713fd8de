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
           "naive_ffn_block", "rotation_count_naive"]


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
