"""Device-resident client pipeline: one jitted scan per token must stay
token-exact vs the float64 plaintext oracle (the same bar as the classic
transport, reference scripts/bootstrap_generation.py:1200-1242)."""

import numpy as np
import pytest

from fhe_spear_tpu.ckks import CkksContext, CkksParams
from fhe_spear_tpu.models.rwkv7 import make_random_model
from fhe_spear_tpu.models.device_client import run_generation_device


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(CkksParams(n=256, num_limbs=3, num_special=1), seed=61)


def test_device_client_token_exact(ctx):
    model = make_random_model(d=32, f=128, n_blocks=3, head_size=16,
                              vocab=64, seed=9)
    results = run_generation_device(ctx, model, seed_tokens=[5, 11, 2],
                                    num_tokens=3)
    assert len(results) == 3
    for r in results:
        assert r["match"], results
        assert r["corr"] > 0.999, results


def test_device_client_streams(ctx):
    """Multi-stream batched token step: each stream token-exact vs its own
    plaintext twin, all streams advanced by ONE dispatch."""
    from fhe_spear_tpu.models.device_client import DeviceTokenRunner
    from fhe_spear_tpu.models.rwkv7 import generate_token_plaintext

    model = make_random_model(d=32, f=128, n_blocks=2, head_size=16,
                              vocab=64, seed=10)
    runner = DeviceTokenRunner(ctx, model, level=ctx.L)
    toks = [3, 17, 42]
    states = [model.zero_state() for _ in toks]
    logits, news = runner.generate_tokens_streams(toks, states)
    for s, t in enumerate(toks):
        lref, sref = generate_token_plaintext(model, t, model.zero_state())
        assert int(np.argmax(logits[s])) == int(np.argmax(lref)), s
        corr = float(np.corrcoef(logits[s], lref)[0, 1])
        assert corr > 0.999, (s, corr)
        np.testing.assert_allclose(np.stack(news[s].wkv),
                                   np.stack(sref.wkv), atol=1e-3)
