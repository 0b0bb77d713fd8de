"""Encrypted similarity retrieval over CKKS — SIMD-batched scoring.

Rebuilds the reference's two retrieval engines (SURVEY.md C3 and C17)
TPU-first; both use Lorentz-lifted, complex-packed embeddings (ops/packing):

Row packing (fhe_common.py:103-216): each document occupies a contiguous
block of ceil(d/2) slots; floor(slots / spd) docs per ciphertext (124 docs
per ct at N=8192/64d, paper/main.tex:768).  The query is tiled across doc
blocks; one CT-PT or CT-CT multiply scores a whole batch; per-doc slot
sums happen client-side after decryption.

Column packing (gpu/ct_ct_search.py:39-114, the "50k docs in 630 ms"
engine): one ciphertext per *coordinate pair* across all docs — slot j of
ciphertext c holds doc_j[2c] + i*doc_j[2c+1]; `slots` docs per chunk.
Scoring a chunk = sum_c ct_c * query_c.  We improve on the reference by
accumulating the raw 3-component products over all coordinate pairs and
relinearizing + rescaling ONCE per chunk (the reference relinearizes per
coordinate pair), and by batching every chunk into one scan.

All kernels are batched over leading dims and jitted once per level.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core.modops import mont_mul, add_mod
from ..ckks.context import CkksContext
from ..ckks.ciphertext import Ciphertext, Plaintext
from .packing import euclidean_to_lorentz, pack_complex, pack_complex_conjugate

__all__ = ["RowPackedRetrieval", "ColumnPackedRetrieval"]


def _lift(docs: np.ndarray, lorentz: bool) -> np.ndarray:
    docs = np.asarray(docs, dtype=np.float64)
    return euclidean_to_lorentz(docs) if lorentz else docs


def _query_lift(q: np.ndarray, lorentz: bool) -> np.ndarray:
    q = _lift(q, lorentz)
    if lorentz:
        q = q.copy()
        q[..., 0] = -q[..., 0]  # sign-flip q0: Lorentz IP becomes a plain dot
    return q


class RowPackedRetrieval:
    """Docs along slot blocks; one multiply scores a whole doc batch."""

    def __init__(self, ctx: CkksContext, dim: int, lorentz: bool = True):
        self.ctx = ctx
        self.lorentz = lorentz
        self.dim = dim
        d_packed = dim + (1 if lorentz else 0)
        self.spd = (d_packed + 1) // 2          # slots per doc
        self.docs_per_ct = ctx.slots // self.spd

    def _pack_docs(self, docs: np.ndarray) -> tuple[np.ndarray, int]:
        """[n, dim] -> packed slot matrix [n_batches, slots] complex."""
        z = pack_complex(_lift(docs, self.lorentz))           # [n, spd]
        n = z.shape[0]
        nb = -(-n // self.docs_per_ct)
        full = np.zeros((nb * self.docs_per_ct, self.spd), dtype=np.complex128)
        full[:n] = z
        full = full.reshape(nb, self.docs_per_ct * self.spd)
        out = np.zeros((nb, self.ctx.slots), dtype=np.complex128)
        out[:, : full.shape[1]] = full
        return out, n

    def encode_docs(self, docs: np.ndarray, level: int | None = None
                    ) -> Plaintext:
        """Server-side plaintext corpus for CT-PT mode (batched)."""
        slots_mat, _ = self._pack_docs(docs)
        pt = self.ctx.encode(slots_mat, level)
        return Plaintext(pt.p[:, None], pt.scale)   # [nb, 1, l, N] broadcast dim

    def encrypt_docs(self, docs: np.ndarray, level: int | None = None
                     ) -> Ciphertext:
        """Encrypted corpus for CT-CT mode (fhe_common.py encrypt_docs_batch)."""
        slots_mat, _ = self._pack_docs(docs)
        return self.ctx.encrypt(slots_mat, level)   # [nb, 2, l, N]

    def encrypt_query(self, q: np.ndarray, level: int | None = None
                      ) -> Ciphertext:
        zq = pack_complex_conjugate(_query_lift(q, self.lorentz))
        tiled = np.zeros(self.ctx.slots, dtype=np.complex128)
        block = np.tile(zq, self.docs_per_ct)
        tiled[: block.shape[0]] = block
        return self.ctx.encrypt(tiled, level)

    def scores_ctpt(self, query_ct: Ciphertext, docs_pt: Plaintext) -> Ciphertext:
        """[server] one batched CT-PT multiply + rescale."""
        return self.ctx.rescale(self.ctx.mul_plain(query_ct, docs_pt))

    def scores_ctct(self, query_ct: Ciphertext, docs_ct: Ciphertext) -> Ciphertext:
        """[server] one batched CT-CT multiply + relin + rescale."""
        return self.ctx.rescale(self.ctx.multiply(query_ct, docs_ct))

    def decode_scores(self, ct_scores: Ciphertext, n_docs: int) -> np.ndarray:
        """[client] decrypt + per-doc slot sums of real parts."""
        z = self.ctx.decrypt_vec_complex(ct_scores)         # [nb, slots]
        z = np.atleast_2d(z)[:, : self.docs_per_ct * self.spd]
        per_doc = z.real.reshape(-1, self.spd).sum(axis=-1)
        return per_doc[:n_docs]


class ColumnPackedRetrieval:
    """Coordinate pairs along ciphertexts, docs along slots (C17)."""

    def __init__(self, ctx: CkksContext, dim: int, lorentz: bool = True):
        self.ctx = ctx
        self.lorentz = lorentz
        self.dim = dim
        d_packed = dim + (1 if lorentz else 0)
        self.n_coord = (d_packed + 1) // 2      # ciphertexts per chunk
        self.docs_per_chunk = ctx.slots

    def encrypt_corpus(self, docs: np.ndarray) -> Ciphertext:
        """[n, dim] -> Ciphertext batched [n_chunks, C, 2, l, N]."""
        z = pack_complex(_lift(docs, self.lorentz))            # [n, C]
        n = z.shape[0]
        nc = -(-n // self.ctx.slots)
        full = np.zeros((nc * self.ctx.slots, self.n_coord), dtype=np.complex128)
        full[:n] = z
        cols = full.reshape(nc, self.ctx.slots, self.n_coord).transpose(0, 2, 1)
        return self.ctx.encrypt(cols)                          # [nc, C, 2, l, N]

    def encrypt_query(self, q: np.ndarray) -> Ciphertext:
        zq = pack_complex_conjugate(_query_lift(q, self.lorentz))  # [C]
        rep = np.repeat(zq[:, None], self.ctx.slots, axis=1)       # [C, slots]
        return self.ctx.encrypt(rep)                               # [C, 2, l, N]

    def scores(self, corpus_ct: Ciphertext, query_ct: Ciphertext) -> Ciphertext:
        """[server] per chunk: sum_c ct_c * q_c with ONE relin + rescale.

        Returns score ciphertexts [n_chunks, 2, l-1, N]; slot j of chunk k
        holds the score of doc k*slots + j (in its real part).
        """
        l = corpus_ct.level
        out = self._j_scores(l)(corpus_ct.c, query_ct.c)
        scale = corpus_ct.scale * query_ct.scale / float(self.ctx.q_np[l - 1])
        return Ciphertext(out, scale)

    @functools.lru_cache(maxsize=None)
    def _j_scores(self, l):
        ctx = self.ctx
        p, pinv = ctx._p(l)
        rk = ctx.relin_key

        def f(dc, qc):
            # dc: [nc, C, 2, l, N]; qc: [C, 2, l, N]; scan over C
            dc = jnp.moveaxis(dc, 1, 0)        # [C, nc, 2, l, N]

            def body(acc, xs):
                d, q = xs                       # [nc, 2, l, N], [2, l, N]
                d0, d1 = d[..., 0, :, :], d[..., 1, :, :]
                q0, q1 = q[0], q[1]
                t0 = mont_mul(d0, q0, p, pinv)
                t1 = add_mod(mont_mul(d0, q1, p, pinv),
                             mont_mul(d1, q0, p, pinv), p)
                t2 = mont_mul(d1, q1, p, pinv)
                t = jnp.stack([t0, t1, t2], axis=-3)
                return add_mod(acc, t, p), None

            nc = dc.shape[1]
            acc0 = jnp.zeros((nc, 3, l, ctx.n), dtype=jnp.uint32)
            acc, _ = lax.scan(body, acc0, (dc, qc))
            # one relinearization of the accumulated c2 term per chunk
            D = ctx._decompose(acc[..., 2, :, :], l)
            kb, ka = ctx.select_key(rk, l)
            ks = ctx._mod_down(ctx._apply_ksk(D, kb, ka, l), l)
            c = jnp.stack([add_mod(acc[..., 0, :, :], ks[..., 0, :, :], p),
                           add_mod(acc[..., 1, :, :], ks[..., 1, :, :], p)],
                          axis=-3)
            return ctx._rescale_core(c, l)
        return jax.jit(f)

    def decode_scores(self, ct_scores: Ciphertext, n_docs: int) -> np.ndarray:
        z = self.ctx.decrypt_vec_complex(ct_scores)     # [nc, slots]
        return np.atleast_2d(z).real.reshape(-1)[:n_docs]
