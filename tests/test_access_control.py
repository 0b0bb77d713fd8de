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
