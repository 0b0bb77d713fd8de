"""Multi-host block pipeline (parallel/block_pipeline.py): S streams
pipelined over a 'block' mesh axis must be token-exact vs the plaintext
oracle, with per-block state staying host-local and only the residual
ring crossing hosts."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from fhe_spear_tpu.ckks import CkksContext, CkksParams
from fhe_spear_tpu.models.rwkv7 import (make_random_model,
                                        generate_token_plaintext)
from fhe_spear_tpu.models.device_client import DeviceTokenRunner
from fhe_spear_tpu.parallel.block_pipeline import BlockPipeline


@pytest.fixture(scope="module")
def ctx():
    return CkksContext(CkksParams(n=256, num_limbs=3, num_special=1),
                       seed=77)


def test_block_pipeline_token_exact(ctx):
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.array(devs[:4]), ("block",))
    model = make_random_model(d=32, f=128, n_blocks=4, head_size=16,
                              vocab=64, seed=13)
    runner = DeviceTokenRunner(ctx, model, level=ctx.L)
    pipe = BlockPipeline(runner, mesh)
    toks = [3, 17, 42, 7]
    states = [model.zero_state() for _ in toks]
    logits, news = pipe.generate_tokens(toks, states)
    for s, t in enumerate(toks):
        lref, sref = generate_token_plaintext(model, t, model.zero_state())
        assert int(np.argmax(logits[s])) == int(np.argmax(lref)), s
        corr = float(np.corrcoef(logits[s], lref)[0, 1])
        assert corr > 0.999, (s, corr)
        np.testing.assert_allclose(np.stack(news[s].wkv),
                                   np.stack(sref.wkv), atol=1e-3)


def test_block_pipeline_second_token(ctx):
    """State continuity: a second pipelined token from the returned states
    matches the sequential plaintext trajectory."""
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 virtual devices")
    mesh = Mesh(np.array(devs[:2]), ("block",))
    model = make_random_model(d=32, f=128, n_blocks=4, head_size=16,
                              vocab=64, seed=14)
    runner = DeviceTokenRunner(ctx, model, level=ctx.L)
    pipe = BlockPipeline(runner, mesh)
    states = [model.zero_state()]
    logits, states = pipe.generate_tokens([5], states)
    tok = int(np.argmax(logits[0]))
    logits2, _ = pipe.generate_tokens([tok], states)
    lref, sref = generate_token_plaintext(model, 5, model.zero_state())
    lref2, _ = generate_token_plaintext(model, int(np.argmax(lref)), sref)
    assert int(np.argmax(logits2[0])) == int(np.argmax(lref2))
    corr = float(np.corrcoef(logits2[0], lref2)[0, 1])
    assert corr > 0.999, corr
