"""Self-contained encrypted-retrieval demo (SURVEY.md C12,
/root/reference/ret_light_demo.py) and dataset loaders.

The reference embeds with the rwkv_emb 0.4B model (downloaded from HF);
this environment has no network, so the default embedder is a
deterministic hashed bag-of-words projection — the retrieval pipeline
(SVD compression, Lorentz lift, complex packing, CT-PT/CT-CT scoring) is
identical and any embedding model can be plugged in via `embed_fn`
(e.g. a real EmbeddingRWKV forward once weights are present).
"""

from __future__ import annotations

import hashlib
import json
import os
import re

import numpy as np

from ..ckks import CkksContext, CkksParams
from ..ops.retrieval import RowPackedRetrieval, ColumnPackedRetrieval
from ..ops.packing import euclidean_to_lorentz, lorentz_inner

__all__ = ["hashed_embed", "svd_compress", "FheSpearRetriever",
           "load_msmarco_sft", "run_demo"]


def hashed_embed(texts, dim: int = 256) -> np.ndarray:
    """Deterministic hashed bag-of-words embeddings (demo fallback)."""
    out = np.zeros((len(texts), dim))
    for i, t in enumerate(texts):
        for tok in re.findall(r"[a-z0-9]+", t.lower()):
            h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8)
                               .digest(), "little")
            out[i, h % dim] += 1.0 + (h >> 32) % 7 * 0.1
    return out / (np.linalg.norm(out, axis=1, keepdims=True) + 1e-9)


def svd_compress(embs: np.ndarray, dim: int):
    """SVD projection to `dim` (the reference's corpus-side compression,
    scripts/bootstrap_generation.py:1295-1303). Returns (compressed, Vt)."""
    _, _, vt = np.linalg.svd(embs, full_matrices=False)
    proj = vt[:dim].T
    z = embs @ proj
    return z / (np.linalg.norm(z, axis=-1, keepdims=True) + 1e-9), proj


class FheSpearRetriever:
    """End-to-end encrypted retriever (the FHE_SPEAR class of
    ret_light_demo.py:49-159): embed -> compress -> Lorentz -> pack ->
    encrypted scores, in row- or column-packed mode."""

    def __init__(self, ctx: CkksContext | None = None, dim: int = 64,
                 mode: str = "row", lorentz: bool = True, embed_fn=None):
        self.ctx = ctx or CkksContext(
            CkksParams(n=8192, num_limbs=3, num_special=1), seed=0)
        self.dim = dim
        self.embed_fn = embed_fn or hashed_embed
        cls = RowPackedRetrieval if mode == "row" else ColumnPackedRetrieval
        self.eng = cls(self.ctx, dim, lorentz=lorentz)
        self.mode = mode

    def index(self, passages: list[str], encrypted: bool = True):
        self.passages = passages
        embs = self.embed_fn(passages)
        self.z, self.proj = svd_compress(embs, self.dim)
        if self.z.shape[-1] < self.dim:     # rank-limited tiny corpora
            pad = self.dim - self.z.shape[-1]
            self.z = np.pad(self.z, [(0, 0), (0, pad)])
            self.proj = np.pad(self.proj, [(0, 0), (0, pad)])
        if self.mode == "row":
            self._corpus = (self.eng.encrypt_docs(self.z) if encrypted
                            else self.eng.encode_docs(self.z))
        else:
            self._corpus = self.eng.encrypt_corpus(self.z)
        self._encrypted = encrypted
        return self

    def query(self, text: str, k: int = 3):
        q = self.embed_fn([text])[0] @ self.proj
        q = q / (np.linalg.norm(q) + 1e-9)
        if self.mode == "row":
            qct = self.eng.encrypt_query(q)
            ct = (self.eng.scores_ctct(qct, self._corpus) if self._encrypted
                  else self.eng.scores_ctpt(qct, self._corpus))
        else:
            ct = self.eng.scores(self._corpus, self.eng.encrypt_query(q))
        scores = self.eng.decode_scores(ct, len(self.passages))
        top = np.argsort(scores)[::-1][:k]
        return [(int(i), float(scores[i]), self.passages[i]) for i in top]

    def plaintext_scores(self, text: str) -> np.ndarray:
        q = self.embed_fn([text])[0] @ self.proj
        q = q / (np.linalg.norm(q) + 1e-9)
        return lorentz_inner(euclidean_to_lorentz(q),
                             euclidean_to_lorentz(self.z))


def load_msmarco_sft(path: str | None = None, n: int = 100):
    """Parse the Context:/Question: SFT format of the reference's dataset
    (fhe_spear_retrieval.py:29-98; data/msmarco_sft.jsonl)."""
    path = path or "/root/reference/data/msmarco_sft.jsonl"
    passages, questions = [], []
    if not os.path.exists(path):
        return passages, questions
    with open(path) as f:
        for line in f:
            if len(passages) >= n:
                break
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            text = rec.get("text", "")
            m = re.search(r"Context:\s*(.*?)\s*Question:\s*(.*?)\s*Answer:",
                          text, re.S)
            if m:
                passages.append(m.group(1).strip())
                questions.append(m.group(2).strip())
    return passages, questions


def run_demo(n_docs: int = 64, mode: str = "row", verbose: bool = True):
    """ret_light_demo equivalent: retrieval over the shipped MS-MARCO SFT
    passages (or a synthetic corpus), encrypted vs plaintext ranking."""
    passages, questions = load_msmarco_sft(n=n_docs)
    if not passages:
        passages = [f"synthetic passage number {i} about topic {i % 7}"
                    for i in range(n_docs)]
        questions = ["synthetic passage about topic 3"]
    r = FheSpearRetriever(mode=mode).index(passages[:n_docs])
    agree = 0
    n_q = min(10, len(questions))
    for qt in questions[:n_q]:
        enc_top = r.query(qt, k=1)[0][0]
        plain_top = int(np.argmax(r.plaintext_scores(qt)))
        agree += enc_top == plain_top
        if verbose:
            print(f"  q='{qt[:50]}...' enc_top={enc_top} plain_top={plain_top}")
    if verbose:
        print(f"  encrypted ranking agrees with plaintext: {agree}/{n_q}")
    return agree, n_q


def recall_benchmark(n_docs: int = 200, n_queries: int = 20, dim: int = 64,
                     mode: str = "column", n: int = 2048, seed: int = 0,
                     verbose: bool = True):
    """Recall@k of encrypted vs plaintext retrieval over the shipped
    MS-MARCO SFT passages (gold = each question's own context passage, the
    reference's gold+distractor protocol — fhe_spear_retrieval.py:101-191,
    gpu/ct_ct_search.py:117-222).

    Reports R@1/5/10 for the encrypted engine and agreement with the
    plaintext ranking (which isolates FHE noise from embedding quality).
    """
    from ..ckks import CkksContext, CkksParams

    passages, questions = load_msmarco_sft(n=n_docs)
    if not passages:
        rng = np.random.default_rng(seed)
        passages = [f"synthetic topic {i % 29} passage {i}"
                    for i in range(n_docs)]
        questions = [passages[i] for i in range(min(n_queries, n_docs))]
    ctx = CkksContext(CkksParams.retrieval(n=n), seed=seed)
    r = FheSpearRetriever(ctx, dim=dim, mode=mode).index(passages[:n_docs])

    ranks_enc, agree1 = [], 0
    n_q = min(n_queries, len(questions))
    for qi in range(n_q):
        q = questions[qi]
        if mode == "row":
            qct = r.eng.encrypt_query(
                r.embed_fn([q])[0] @ r.proj
                / (np.linalg.norm(r.embed_fn([q])[0] @ r.proj) + 1e-9))
            scores = r.eng.decode_scores(
                r.eng.scores_ctct(qct, r._corpus), len(r.passages))
        else:
            qv = r.embed_fn([q])[0] @ r.proj
            qv = qv / (np.linalg.norm(qv) + 1e-9)
            scores = r.eng.decode_scores(
                r.eng.scores(r._corpus, r.eng.encrypt_query(qv)),
                len(r.passages))
        order = np.argsort(scores)[::-1]
        rank = int(np.where(order == qi)[0][0]) + 1
        ranks_enc.append(rank)
        plain_top = int(np.argmax(r.plaintext_scores(q)))
        agree1 += int(order[0] == plain_top)

    ranks = np.asarray(ranks_enc)
    out = {"recall@1": float((ranks <= 1).mean()),
           "recall@5": float((ranks <= 5).mean()),
           "recall@10": float((ranks <= 10).mean()),
           "plaintext_top1_agreement": agree1 / n_q,
           "n_docs": len(r.passages), "n_queries": n_q, "dim": dim}
    if verbose:
        print(f"  R@1={out['recall@1']:.2f} R@5={out['recall@5']:.2f} "
              f"R@10={out['recall@10']:.2f} "
              f"(enc-vs-plain top1 agreement {out['plaintext_top1_agreement']:.2f})")
    return out
