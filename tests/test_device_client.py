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
