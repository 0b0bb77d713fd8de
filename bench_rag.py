"""Reference-scale end-to-end RAG artifact (SURVEY.md C10/C12; VERDICT r3
#10): encrypted retrieval over real MS-MARCO text + 24-block
device-client generation on the retrieved passage.

Reference analog: run_rag_demo at d=2048 — retrieval 1.0 s + 429 s/token,
R@1 3/3 (/root/reference/paper/main.tex:1017-1029).  Embeddings here are
the hashed-BoW + SVD fallback (the reference's RWKV embedding blobs are
stripped from the snapshot and there is no network egress), so retrieval
QUALITY is anchored by encrypted==plaintext rank agreement, not absolute
recall — see BENCH_LOCAL_r2_real_retrieval.json for that discussion.

Env: RAG_DOCS (default 2000), RAG_QUERIES (default 3), BENCH_D/F/N,
BENCH_TOKENS (default 3).  Prints ONE JSON line; progress to stderr.
"""

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    n_docs = int(os.environ.get("RAG_DOCS", "2000"))
    n_queries = int(os.environ.get("RAG_QUERIES", "3"))
    d = int(os.environ.get("BENCH_D", "2048"))
    f = int(os.environ.get("BENCH_F", "8192"))
    n = int(os.environ.get("BENCH_N", "8192"))
    num_blocks = int(os.environ.get("BENCH_BLOCKS", "24"))
    num_tokens = int(os.environ.get("BENCH_TOKENS", "3"))

    from fhe_spear_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    log(f"devices: {jax.devices()}")

    from fhe_spear_tpu.ckks import CkksContext, CkksParams
    from fhe_spear_tpu.apps.demo import (FheSpearRetriever, load_msmarco_sft)

    # --- phase 1: encrypted retrieval over real text ----------------------
    passages, questions = load_msmarco_sft(n=n_docs)
    if not passages:
        log("MS-MARCO data unavailable; synthesizing corpus")
        passages = [f"Document {i} text about topic {i % 97}."
                    for i in range(n_docs)]
        questions = [f"What is topic {i % 97}?" for i in range(n_docs)]
    log(f"corpus: {len(passages)} passages")

    t0 = time.perf_counter()
    ret_ctx = CkksContext(CkksParams.retrieval(n=8192), seed=0)
    retr = FheSpearRetriever(ret_ctx, dim=64, mode="row")
    retr.index(passages)
    t_index = time.perf_counter() - t0
    log(f"index + encrypt corpus: {t_index:.1f}s")

    ret_times, rank_agree = [], 0
    for qi in range(n_queries):
        q = questions[qi]
        t0 = time.perf_counter()
        hits = retr.query(q, k=1)
        ret_times.append(time.perf_counter() - t0)
        # plaintext twin: same embedding, plain dot products
        top_plain = int(np.argmax(retr.plaintext_scores(q)))
        rank_agree += int(hits[0][0] == top_plain)
        log(f"query {qi}: retrieved #{hits[0][0]} "
            f"(plain {top_plain}) {ret_times[-1]:.2f}s")
    ret_s = float(np.median(ret_times))

    # --- phase 2: 24-block device-client generation on the retrieved
    # passage (plaintext prefill builds the recurrent state — the
    # reference's long-context strategy, paper/main.tex:1109) -------------
    from fhe_spear_tpu.models.rwkv7 import (make_random_model, save_model,
                                            load_model)
    from fhe_spear_tpu.models.device_client import run_generation_device
    from fhe_spear_tpu.apps.rag import _toy_tokenize

    t0 = time.perf_counter()
    cache = f"/tmp/bench_model_{d}_{f}_{num_blocks}.dir"
    if os.path.exists(cache):
        model = load_model(cache)
    else:
        model = make_random_model(d=d, f=f, n_blocks=num_blocks,
                                  head_size=64, vocab=1000, seed=42)
        save_model(cache, model)
    log(f"model ({time.perf_counter() - t0:.1f}s)")

    t0 = time.perf_counter()
    gen_ctx = CkksContext(CkksParams(n=n, num_limbs=3, num_special=1),
                          seed=0)
    log(f"generation context ({time.perf_counter() - t0:.1f}s)")

    passage = passages[0]
    prompt = _toy_tokenize(passage + " " + questions[0],
                           model.emb.shape[0])
    log(f"prompt: {len(prompt)} tokens (passage prefill, plaintext)")
    results = run_generation_device(
        gen_ctx, model, seed_tokens=prompt, num_tokens=num_tokens + 1,
        level=3, cache_dir=os.environ.get("FHE_PREENC_CACHE",
                                          "/tmp/fhe_preenc_cache"),
        log_fn=log)
    steady = [r["sec"] for r in results[1:]]
    s_token = float(np.median(steady))
    all_match = all(r["match"] for r in results)

    print(json.dumps({
        "metric": f"e2e RAG: encrypted retrieval ({len(passages)} docs) + "
                  f"{num_blocks}-block device-client generation "
                  f"D={d} F={f} N={n}",
        "value": round(s_token, 3),
        "unit": "s/token (+ retrieval)",
        "vs_baseline": round(429.0 / s_token, 3),
        "detail": {
            "retrieval_s": round(ret_s, 3),
            "index_s": round(t_index, 1),
            "rank_agree": f"{rank_agree}/{n_queries}",
            "tokens_match_plaintext": all_match,
            "min_logit_corr": min(r["corr"] for r in results),
            "prompt_tokens_prefilled": len(prompt),
            "reference": "ret 1.0 s + 429 s/token at d=2048 "
                         "(paper/main.tex:1017-1029)",
        },
    }))


if __name__ == "__main__":
    main()
