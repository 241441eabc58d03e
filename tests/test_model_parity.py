"""Logits parity vs HuggingFace torch implementations (offline, random init).

This is the rebuild of verify_baseline.py's core idea
(/root/reference/verify_baseline.py:84-139): run the same weights through a
trusted dense implementation (HF transformers on CPU torch) and through this
framework, and require logits to agree. Since the environment has no network,
the HF models are constructed from configs with random init and the weights
are converted — which tests exactly the same thing (the forward math and the
weight conversion), without downloads.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from mlio_tpu.models import forward, load_model, Impl


def _small_gpt2_torch():
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    cfg = GPT2Config(
        vocab_size=257, n_positions=64, n_embd=48, n_layer=3, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    model = GPT2LMHeadModel(cfg).eval()
    return model


def _small_llama_torch(kv_heads):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=257, hidden_size=48, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=kv_heads,
        max_position_embeddings=64, rope_theta=10000.0, tie_word_embeddings=False,
        attention_dropout=0.0,
    )
    model = LlamaForCausalLM(cfg).eval()
    return model


def _hf_logits(model, ids):
    import torch

    with torch.no_grad():
        return model(input_ids=torch.tensor(ids)).logits.numpy()


def test_gpt2_logits_match_hf():
    model = _small_gpt2_torch()
    spec, params = load_model("gpt2", torch_model=model, dtype=jnp.float32)
    ids = np.random.default_rng(0).integers(0, 257, size=(2, 17))
    ours, _ = forward(params, spec, jnp.asarray(ids))
    theirs = _hf_logits(model, ids)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("kv_heads", [4, 2, 1], ids=["mha", "gqa", "mqa"])
def test_llama_logits_match_hf(kv_heads):
    model = _small_llama_torch(kv_heads)
    spec, params = load_model("llama", torch_model=model, dtype=jnp.float32)
    assert spec.num_kv_heads == kv_heads
    ids = np.random.default_rng(1).integers(0, 257, size=(2, 13))
    ours, _ = forward(params, spec, jnp.asarray(ids))
    theirs = _hf_logits(model, ids)
    # fp32 BLAS accumulation-order differences (oneDNN vs XLA:CPU) give
    # ~2.5e-3 worst-case drift through 3 layers; per-layer diff is ~2e-4.
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=5e-3)


def test_gpt2_greedy_generation_matches_hf():
    """Generation smoke test (parity: verify_baseline.py:247-304)."""
    import torch

    model = _small_gpt2_torch()
    spec, params = load_model("gpt2", torch_model=model, dtype=jnp.float32)
    ids = np.random.default_rng(2).integers(0, 257, size=(1, 8))

    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor(ids), max_new_tokens=8, do_sample=False,
            pad_token_id=0).numpy()

    from mlio_tpu.runtime.generate import greedy_generate

    ours = greedy_generate(params, spec, jnp.asarray(ids), max_new_tokens=8)
    np.testing.assert_array_equal(np.asarray(ours), hf_out)
