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


def test_torch_checkpoint_loading(ctx, tmp_path):
    """VERDICT r3 #8: synthesize a real-format RWKV-7 .pth (torch save
    layout: [out,in] projection matrices, (1,1,C) per-channel params —
    /root/reference/fhe_rwkv_inference.py:19-26 squeeze/transpose
    semantics) and prove load_torch_model end-to-end: loaded fields match
    the source model, head-size-preserving truncation works, and one
    client-aided FHE token is token-exact vs the plaintext twin."""
    torch = pytest.importorskip("torch")
    from fhe_spear_tpu.models.rwkv7 import load_torch_model

    src = make_random_model(d=32, f=64, n_blocks=2, head_size=16, vocab=64,
                            seed=3)

    def t(a):
        return torch.tensor(np.ascontiguousarray(np.asarray(a)),
                            dtype=torch.float32)

    def c3(a):  # per-channel params are stored (1, 1, C) in checkpoints
        return t(np.asarray(a).reshape(1, 1, -1))

    w = {
        "emb.weight": t(src.emb),
        "head.weight": t(src.head_w.T),        # checkpoint is [vocab, C]
        "ln_out.weight": t(src.ln_out_w), "ln_out.bias": t(src.ln_out_b),
        "blocks.0.ln0.weight": t(src.ln0_w), "blocks.0.ln0.bias": t(src.ln0_b),
    }
    for i, b in enumerate(src.blocks):
        p = f"blocks.{i}."
        w.update({
            p + "ln1.weight": t(b.ln1_w), p + "ln1.bias": t(b.ln1_b),
            p + "ln2.weight": t(b.ln2_w), p + "ln2.bias": t(b.ln2_b),
            p + "att.ln_x.weight": t(b.ln_x_w),
            p + "att.ln_x.bias": t(b.ln_x_b),
            p + "att.x_r": c3(b.x_r), p + "att.x_k": c3(b.x_k),
            p + "att.x_v": c3(b.x_v), p + "att.x_g": c3(b.x_g),
            p + "att.x_w": c3(b.x_w), p + "att.x_a": c3(b.x_a),
            p + "ffn.x_k": c3(b.x_k_ffn),
            p + "att.w0": c3(b.w0), p + "att.w1": t(b.w1),
            p + "att.w2": t(b.w2),
            p + "att.a0": c3(b.a0), p + "att.a1": t(b.a1),
            p + "att.a2": t(b.a2),
            p + "att.v0": c3(b.v0), p + "att.v1": t(b.v1),
            p + "att.v2": t(b.v2),
            p + "att.g1": t(b.g1), p + "att.g2": t(b.g2),
            p + "att.k_k": c3(b.k_k), p + "att.k_a": c3(b.k_a),
            p + "att.r_k": t(b.r_k),
            # projections are stored [out, in]
            p + "att.receptance.weight": t(b.W_r.T),
            p + "att.key.weight": t(b.W_k.T),
            p + "att.value.weight": t(b.W_v.T),
            p + "att.output.weight": t(b.W_o.T),
            p + "ffn.key.weight": t(b.W_key_ffn.T),
            p + "ffn.value.weight": t(b.W_val_ffn.T),
        })
    path = str(tmp_path / "rwkv7_synth.pth")
    torch.save(w, path)

    m = load_torch_model(path, d=32, f=64, n_blocks=2)
    assert m.blocks[0].n_head == 2 and m.blocks[0].head_size == 16
    np.testing.assert_allclose(m.blocks[0].W_r, src.blocks[0].W_r, atol=1e-6)
    np.testing.assert_allclose(m.blocks[1].w0, src.blocks[1].w0, atol=1e-6)
    np.testing.assert_allclose(m.blocks[1].v0, src.blocks[1].v0, atol=1e-6)
    np.testing.assert_allclose(m.blocks[0].W_val_ffn, src.blocks[0].W_val_ffn,
                               atol=1e-6)
    np.testing.assert_allclose(m.head_w, src.head_w, atol=1e-6)
    assert m.blocks[0].w0.shape == (32,)   # (1,1,C) squeezed + truncated

    # head-size-preserving truncation (scripts/bootstrap_generation.py:1083)
    m16 = load_torch_model(path, d=16, f=64, n_blocks=1)
    assert m16.blocks[0].n_head == 1 and m16.blocks[0].head_size == 16
    np.testing.assert_allclose(m16.blocks[0].W_k,
                               src.blocks[0].W_k[:16, :16].astype(np.float32),
                               atol=1e-6)

    # one FHE token on the LOADED model, token-exact vs its plaintext twin
    results = run_generation(ctx, m, seed_tokens=[5, 2], num_tokens=1,
                             level=3, verbose=False)
    assert results[0]["match"], results
    assert results[0]["corr"] > 0.9999, results
