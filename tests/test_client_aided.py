"""Client-aided RWKV-7 generation: FHE tokens must match the plaintext twin
(the reference's token-exactness oracle, scripts/bootstrap_generation.py:
1200-1242; acceptance = identical tokens, corr ~1.0, paper/main.tex:1055)."""

import numpy as np
import pytest

from fhe_spear_tpu.ckks import CkksContext, CkksParams
from fhe_spear_tpu.models.rwkv7 import (
    make_random_model, generate_token_plaintext,
)
from fhe_spear_tpu.models.client_aided import (
    FheRwkvServer, FheRwkvClient, run_generation,
)


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(CkksParams(n=256, num_limbs=3, num_special=1), seed=31)


@pytest.fixture(scope="module")
def model():
    return make_random_model(d=32, f=128, n_blocks=2, head_size=16, vocab=64,
                             seed=42)


def test_plaintext_forward_deterministic(model):
    st = model.zero_state()
    logits1, st1 = generate_token_plaintext(model, 3, st)
    logits2, _ = generate_token_plaintext(model, 3, st)
    np.testing.assert_array_equal(logits1, logits2)
    # state advanced
    assert not np.allclose(st1.wkv[0], st.wkv[0])


def test_single_block_vs_oracle(ctx, model):
    """Drive one client-aided block and compare against plaintext_block."""
    from fhe_spear_tpu.models.rwkv7 import plaintext_block, layer_norm

    server = FheRwkvServer(ctx, model, level=3)
    client = FheRwkvClient(ctx, model, server)
    rng = np.random.default_rng(0)
    d = model.d
    x = rng.normal(0, 1, d)
    xpa, xpf = rng.normal(0, 1, d), rng.normal(0, 1, d)
    state = rng.normal(0, 0.3, (model.n_head, model.head_size, model.head_size))
    want_x, want_xpa, want_xpf, want_s, _ = plaintext_block(
        model.blocks[0], x, xpa, xpf, state, None)
    got_x, got_xpa, got_xpf, got_s, _, _ = client.block(
        0, x, xpa, xpf, state, None)
    np.testing.assert_allclose(got_x, want_x, atol=1e-3)
    np.testing.assert_allclose(got_xpa, want_xpa, atol=1e-12)
    np.testing.assert_allclose(got_s, want_s, atol=1e-3)


def test_token_generation_matches(ctx, model):
    results = run_generation(ctx, model, seed_tokens=[5, 11, 2], num_tokens=3,
                             level=3, verbose=False)
    for r in results:
        assert r["match"], results
        assert r["corr"] > 0.9999, results
