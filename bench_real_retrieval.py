"""Encrypted retrieval quality on the reference's REAL shipped corpus.

The reference's R@10 95.0 row (BASELINE.md; gpu/ct_ct_search.py:117-222)
uses 10k qwen3 embeddings + qrels — artifacts stripped from the checkout
(.MISSING_LARGE_BLOBS: qwen3_emb_10k.npz, queries.dev.tsv) and not
regenerable without network egress.  This bench runs the strongest
real-artifact protocol available: the shipped MS-MARCO SFT corpus
(data/msmarco_sft.jsonl, 5k real passages + questions), TF-IDF -> SVD
64-d embeddings (the same compress-to-64d regime the paper evaluates),
gold = each question's own passage.

Reported: plaintext R@1/5/10 (embedding quality) and encrypted
R@1/5/10 through the CT-CT column-packed engine (the paper's claim under
test: ENCRYPTION PRESERVES THE RANKING — encrypted R@k must equal
plaintext R@k; score corr ~ 1).

Env: BENCH_DOCS (default 2000), BENCH_QUERIES (200), BENCH_N (8192).
Prints ONE JSON line; progress to stderr.
"""

import json
import os
import re
import sys
import time

import numpy as np

SFT = "/root/reference/data/msmarco_sft.jsonl"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def load_msmarco_sft(path, n):
    passages, questions = [], []
    seen = {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            m = re.search(r"Context:\s*(.*?)\s*Question:\s*(.*)",
                          rec.get("query", rec.get("text", "")), re.S)
            if not m:
                continue
            ctx, q = m.group(1).strip(), m.group(2).strip()
            if ctx in seen:
                continue
            seen[ctx] = len(passages)
            passages.append(ctx)
            questions.append(q)
            if len(passages) >= n:
                break
    return passages, questions


def embed_tfidf_svd(passages, questions, dim=64, seed=0):
    from sklearn.feature_extraction.text import TfidfVectorizer
    from sklearn.decomposition import TruncatedSVD

    vec = TfidfVectorizer(sublinear_tf=True, stop_words="english",
                          max_features=50000)
    x_docs = vec.fit_transform(passages)
    x_q = vec.transform(questions)
    svd = TruncatedSVD(n_components=dim, random_state=seed)
    d = svd.fit_transform(x_docs)
    q = svd.transform(x_q)
    d /= np.linalg.norm(d, axis=-1, keepdims=True) + 1e-9
    q /= np.linalg.norm(q, axis=-1, keepdims=True) + 1e-9
    return d, q


def recall_at_k(scores, golds, ks=(1, 5, 10)):
    out = {}
    ranks = np.argsort(-scores, axis=-1)
    for k in ks:
        out[f"R@{k}"] = float(np.mean([g in ranks[i, :k]
                                       for i, g in enumerate(golds)]))
    return out


def main():
    n_docs = int(os.environ.get("BENCH_DOCS", "2000"))
    n_queries = int(os.environ.get("BENCH_QUERIES", "200"))
    n = int(os.environ.get("BENCH_N", "8192"))
    dim = 64

    t0 = time.perf_counter()
    passages, questions = load_msmarco_sft(SFT, n_docs)
    docs, queries = embed_tfidf_svd(passages, questions, dim)
    log(f"{len(passages)} real passages embedded to {dim}d "
        f"({time.perf_counter() - t0:.1f}s)")

    rng = np.random.default_rng(0)
    q_idx = rng.permutation(len(questions))[:n_queries]
    golds = list(q_idx)

    # plaintext reference ranking
    plain_scores = queries[q_idx] @ docs.T
    plain = recall_at_k(plain_scores, golds)
    log(f"plaintext: {plain}")

    from fhe_spear_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    log(f"devices: {jax.devices()}")
    from fhe_spear_tpu.ckks import CkksContext, CkksParams
    from fhe_spear_tpu.ops.retrieval import ColumnPackedRetrieval

    t0 = time.perf_counter()
    ctx = CkksContext(CkksParams.retrieval(n=n), seed=0)
    eng = ColumnPackedRetrieval(ctx, dim=dim, lorentz=False)
    enc_corpus = eng.encrypt_corpus(docs)
    log(f"context + corpus encrypted ({time.perf_counter() - t0:.1f}s)")

    t0 = time.perf_counter()
    enc_scores = np.zeros_like(plain_scores)
    for i, qi in enumerate(q_idx):
        ct = eng.scores(enc_corpus, eng.encrypt_query(queries[qi]))
        enc_scores[i] = eng.decode_scores(ct, len(docs))
    dt = time.perf_counter() - t0
    enc = recall_at_k(enc_scores, golds)
    corr = float(np.corrcoef(enc_scores.ravel(), plain_scores.ravel())[0, 1])
    log(f"encrypted: {enc} score_corr={corr:.8f} "
        f"({dt / n_queries * 1000:.1f} ms/query)")

    rank_exact = all(
        set(np.argsort(-enc_scores[i])[:10]) == set(np.argsort(-plain_scores[i])[:10])
        for i in range(len(q_idx)))

    print(json.dumps({
        "metric": f"encrypted R@10 on real MS-MARCO text "
                  f"({len(passages)} docs, 64d, N={n})",
        "value": enc["R@10"],
        "unit": "recall",
        "vs_baseline": round(enc["R@10"] / max(plain["R@10"], 1e-9), 4),
        "detail": {
            "plaintext": plain, "encrypted": enc,
            "score_corr": corr, "top10_sets_identical": rank_exact,
            "ms_per_query": round(dt / n_queries * 1000, 2),
            "note": "qwen3_emb_10k.npz stripped from reference checkout "
                    "(.MISSING_LARGE_BLOBS); TF-IDF+SVD on the shipped "
                    "real MS-MARCO passages is the strongest available "
                    "real-artifact protocol (vs_baseline here = "
                    "encrypted/plaintext recall ratio; 1.0 = encryption "
                    "preserves ranking)",
        },
    }))


if __name__ == "__main__":
    main()
