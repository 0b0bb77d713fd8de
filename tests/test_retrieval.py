"""Encrypted retrieval vs plaintext oracle: identical rankings across
plaintext / CT-PT / CT-CT modes (the reference's 3-mode ablation,
scripts/bootstrap_generation.py:1451-1538)."""

import numpy as np
import pytest

from fhe_spear_tpu.ckks import CkksContext, CkksParams
from fhe_spear_tpu.ops.packing import (
    euclidean_to_lorentz, lorentz_inner, pack_complex, pack_complex_conjugate,
    unpack_complex,
)
from fhe_spear_tpu.ops.retrieval import RowPackedRetrieval, ColumnPackedRetrieval


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(CkksParams(n=256, num_limbs=3, num_special=1), seed=21)


def make_corpus(n_docs=40, dim=16, seed=0):
    rng = np.random.default_rng(seed)
    docs = rng.normal(0, 1, (n_docs, dim))
    docs /= np.linalg.norm(docs, axis=-1, keepdims=True)
    q = rng.normal(0, 1, dim)
    q /= np.linalg.norm(q)
    return docs, q


def lorentz_scores(q, docs):
    return lorentz_inner(euclidean_to_lorentz(q), euclidean_to_lorentz(docs))


def test_packing_roundtrip():
    v = np.arange(7, dtype=float)
    z = pack_complex(v)
    np.testing.assert_allclose(unpack_complex(z, 7), v)


def test_conjugate_packing_dot():
    rng = np.random.default_rng(1)
    a, b = rng.normal(0, 1, 10), rng.normal(0, 1, 10)
    got = np.sum(pack_complex(a) * pack_complex_conjugate(b)).real
    np.testing.assert_allclose(got, a @ b, atol=1e-12)


def test_row_ctpt(ctx):
    docs, q = make_corpus()
    eng = RowPackedRetrieval(ctx, dim=16)
    ct_scores = eng.scores_ctpt(eng.encrypt_query(q), eng.encode_docs(docs))
    got = eng.decode_scores(ct_scores, len(docs))
    want = lorentz_scores(q, docs)
    np.testing.assert_allclose(got, want, atol=1e-3)
    assert np.argmax(got) == np.argmax(want)


def test_row_ctct(ctx):
    docs, q = make_corpus(seed=2)
    eng = RowPackedRetrieval(ctx, dim=16)
    ct_scores = eng.scores_ctct(eng.encrypt_query(q), eng.encrypt_docs(docs))
    got = eng.decode_scores(ct_scores, len(docs))
    want = lorentz_scores(q, docs)
    np.testing.assert_allclose(got, want, atol=1e-3)
    assert list(np.argsort(got)[-5:]) == list(np.argsort(want)[-5:])


def test_row_multi_batch(ctx):
    """More docs than fit in one ciphertext -> batched leading dim."""
    docs, q = make_corpus(n_docs=40, dim=16, seed=3)
    eng = RowPackedRetrieval(ctx, dim=16)
    assert eng.docs_per_ct < 40  # slots=128, spd=9 -> 14 docs/ct
    got = eng.decode_scores(
        eng.scores_ctct(eng.encrypt_query(q), eng.encrypt_docs(docs)), 40)
    np.testing.assert_allclose(got, lorentz_scores(q, docs), atol=1e-3)


def test_column_packed(ctx):
    docs, q = make_corpus(n_docs=300, dim=16, seed=4)  # 3 chunks at slots=128
    eng = ColumnPackedRetrieval(ctx, dim=16)
    ct_scores = eng.scores(eng.encrypt_corpus(docs), eng.encrypt_query(q))
    got = eng.decode_scores(ct_scores, len(docs))
    want = lorentz_scores(q, docs)
    np.testing.assert_allclose(got, want, atol=2e-3)
    assert np.argmax(got) == np.argmax(want)


def test_column_euclidean(ctx):
    docs, q = make_corpus(n_docs=50, dim=16, seed=5)
    eng = ColumnPackedRetrieval(ctx, dim=16, lorentz=False)
    got = eng.decode_scores(
        eng.scores(eng.encrypt_corpus(docs), eng.encrypt_query(q)), 50)
    np.testing.assert_allclose(got, docs @ q, atol=1e-3)
