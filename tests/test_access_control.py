"""Access control: authorized users retrieve exactly, unauthorized users'
rankings are destroyed; corrections cost zero levels (SURVEY.md C13/C14)."""

import numpy as np
import pytest

from fhe_spear_tpu.ckks import CkksContext, CkksParams
from fhe_spear_tpu.apps.access_control import (
    AccessControlledCorpus, classify_passage, detect_pii, security_sweep,
)


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(CkksParams(n=256, num_limbs=3, num_special=1), seed=71)


def make_corpus(n_docs=20, dim=16, seed=0):
    rng = np.random.default_rng(seed)
    docs = rng.normal(0, 1, (n_docs, dim))
    docs /= np.linalg.norm(docs, axis=-1, keepdims=True)
    q = docs[3] + rng.normal(0, 0.05, dim)  # query close to doc 3
    classes = [set() for _ in range(n_docs)]
    for i in range(0, n_docs, 2):
        classes[i] = {"financial"}
    classes[3] = {"financial", "medical"}
    return docs, q / np.linalg.norm(q), classes


def test_pii_classification():
    text = ("Call 555-123-4567 or email a@b.com. Revenue was $4.2 million, "
            "up 12% since 2020. Dose: 50 mg.")
    classes = classify_passage(text)
    assert classes == {"personal", "financial", "temporal", "medical"}
    assert len(detect_pii(text)) >= 5


def test_pii_merged_span_keeps_all_classes():
    # "30% of patients" matches PERCENT ("30%") and MEDICAL_STAT
    # ("30% of patients"); the overlap merges into one
    # PERCENT+MEDICAL_STAT span, which must still contribute BOTH
    # classes (reference fhe_access_control.py:69-76 splits on '+').
    text = "The trial found 30% of patients improved."
    spans = detect_pii(text)
    assert any("+" in s["type"] for s in spans), spans
    assert classify_passage(text) == {"financial", "medical"}


def test_authorized_exact_unauthorized_destroyed(ctx):
    docs, q, classes = make_corpus()
    corpus = AccessControlledCorpus(ctx, dim=16, noise_scale=100.0, seed=1)
    corpus.build(docs, classes)

    alice = corpus.corrections_for({"financial", "medical"})
    bob = corpus.corrections_for(set())

    true_scores = corpus.retrieve(q, ctx.encrypt(
        corpus.eng._pack_docs(docs)[0]))
    alice_scores = corpus.retrieve(q, corpus.apply_corrections(alice))
    bob_scores = corpus.retrieve(q, corpus.apply_corrections(bob))

    np.testing.assert_allclose(alice_scores, true_scores, atol=1e-2)
    assert np.argmax(alice_scores) == np.argmax(true_scores) == 3
    # Bob's scores on noised (restricted) docs are garbage
    restricted = [i for i, cs in enumerate(classes) if cs]
    assert np.abs(np.asarray(bob_scores)[restricted]).max() > 10.0
    assert np.argmax(bob_scores) != 3 or abs(bob_scores[3]) > 10


def test_per_passage_mode(ctx):
    docs, q, classes = make_corpus(seed=2)
    corpus = AccessControlledCorpus(ctx, dim=16, noise_scale=100.0,
                                    per_passage=True, seed=2)
    corpus.build(docs, classes)
    full = corpus.corrections_for({"financial", "medical"})
    alice_scores = corpus.retrieve(q, corpus.apply_corrections(full))
    true_scores = corpus.retrieve(q, ctx.encrypt(
        corpus.eng._pack_docs(docs)[0]))
    np.testing.assert_allclose(alice_scores, true_scores, atol=1e-2)


def test_security_sweep_separation_grows(ctx):
    docs, q, classes = make_corpus(seed=3)
    corpus = AccessControlledCorpus(ctx, dim=16, noise_scale=100.0, seed=3)
    corpus.build(docs, classes)
    rows = security_sweep(corpus, docs, classes, scales=(1, 100))
    assert rows[1]["separation"] > rows[0]["separation"] * 10


def test_leak_study_reproduces_reference_findings():
    """The C14 quantitative study (per_passage_noise.py:145-209): shared
    class noise leaks within-class score differences EXACTLY (corr 1.0,
    reference measured 1.0); per-passage noise destroys them (|corr| < 0.1
    vs reference -0.07) with a large noise/signal ratio (reference 1208x)."""
    from fhe_spear_tpu.apps.noise_study import run_leak_study

    res = run_leak_study(n_docs=32, dim=17, n_queries=16, alpha=100.0)
    assert res["class_diff_corr"] > 0.999999, res
    assert res["class_max_abs_err"] < 1e-9, res
    assert abs(res["passage_diff_corr"]) < 0.1, res
    assert res["noise_to_signal"] > 100, res


def test_leak_study_fhe_restore(ctx):
    """Per-passage corrections restore authorized R@1 exactly under real
    encryption; the unauthorized view does not retrieve the true top-1
    (per_passage_noise.py:211-289)."""
    from fhe_spear_tpu.apps.noise_study import run_fhe_restore

    res = run_fhe_restore(ctx, n_docs=16, dim=16)
    assert res["auth_top1"] == res["true_top1"], res
    assert res["auth_score_corr"] > 0.999, res
    assert res["unauth_score_corr"] < 0.5, res


def test_generation_on_retrieved_passage(ctx):
    """VERDICT r3 #6 (C13 tail): per-user retrieval chains into FHE
    generation on the retrieved passage (the reference's Alice/Bob demo,
    fhe_access_control.py:498-572).  The authorized user retrieves the
    true passage and generates token-exactly; the unauthorized user's
    noised retrieval lands elsewhere, so the generations differ — the
    FHE generation itself is exact for BOTH (access control acts through
    retrieval, not by corrupting the generator)."""
    from fhe_spear_tpu.apps.access_control import generation_demo
    from fhe_spear_tpu.models.rwkv7 import make_random_model
    from fhe_spear_tpu.models.client_aided import FheRwkvServer, FheRwkvClient

    docs, q, classes = make_corpus()
    passages = [f"Passage {i} reports figure {i * 7}. Extra sentence."
                for i in range(len(docs))]
    corpus = AccessControlledCorpus(ctx, dim=16, noise_scale=100.0, seed=1)
    corpus.build(docs, classes)

    model = make_random_model(d=16, f=32, n_blocks=1, head_size=8, vocab=64,
                              seed=9)
    gen_ctx = CkksContext(CkksParams(n=256, num_limbs=3, num_special=1),
                          seed=72)
    server = FheRwkvServer(gen_ctx, model, level=3)
    client = FheRwkvClient(gen_ctx, model, server)

    res = generation_demo(
        corpus, passages, q, "Based on the text above, the figure is",
        {"alice": {"financial", "medical"}, "bob": set()},
        client, num_tokens=2)
    assert res["alice"]["retrieved"] == 3, res["alice"]
    assert res["alice"]["token_matches"] == 2, res["alice"]
    assert res["bob"]["retrieved"] != 3, res["bob"]
    assert res["bob"]["token_matches"] == 2, res["bob"]
    assert res["outputs_differ"], res
