"""Logits parity for the widened model-family coverage.

Extends tests/test_model_parity.py's verify_baseline.py pattern
(/root/reference/verify_baseline.py:84-139) to the architectures the
reference's converters recognize beyond GPT-2/Llama
(flash_attention.py:952-1168 lists GPT-NeoX, OPT, ... attention classes):
Qwen2 (QKV biases), GPT-NeoX (parallel residual + partial rotary + fused
per-head-packed QKV), Phi (shared-LN parallel residual + head bias), OPT
(learned positions with +2 offset, ReLU), and Gemma ((1+w) RMSNorm + GeGLU +
scaled embeddings). HF models are built from small configs with random init
(offline) and weights are converted — testing forward math + conversion.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from mlio_tpu.models import forward, load_model


def _hf_logits(model, ids):
    import torch

    with torch.no_grad():
        return model(input_ids=torch.tensor(ids)).logits.numpy()


def _check(name, model, vocab, atol=5e-3):
    spec, params = load_model(name, torch_model=model, dtype=jnp.float32)
    ids = np.random.default_rng(0).integers(0, vocab, size=(2, 13))
    ours, _ = forward(params, spec, jnp.asarray(ids))
    theirs = _hf_logits(model, ids)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=atol)
    return spec


def test_qwen2_logits_match_hf():
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    cfg = Qwen2Config(
        vocab_size=257, hidden_size=48, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
        attention_dropout=0.0)
    spec = _check("qwen2-test", Qwen2ForCausalLM(cfg).eval(), 257)
    assert spec.use_qkv_bias and not spec.use_mlp_bias


@pytest.mark.parametrize("parallel", [True, False])
def test_gpt_neox_logits_match_hf(parallel):
    import torch
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    torch.manual_seed(0)
    cfg = GPTNeoXConfig(
        vocab_size=257, hidden_size=48, intermediate_size=192,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=64, rotary_pct=0.25,
        use_parallel_residual=parallel, hidden_act="gelu",
        attention_dropout=0.0, hidden_dropout=0.0)
    spec = _check("pythia-test", GPTNeoXForCausalLM(cfg).eval(), 257)
    assert spec.parallel_residual == parallel
    assert spec.rope_dim == 2  # 12 * 0.25 -> 3 -> rounded down to even


def test_phi_logits_match_hf():
    import torch
    from transformers import PhiConfig, PhiForCausalLM

    torch.manual_seed(0)
    cfg = PhiConfig(
        vocab_size=257, hidden_size=48, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=64, partial_rotary_factor=0.5,
        attention_dropout=0.0, embd_pdrop=0.0, resid_pdrop=0.0)
    spec = _check("phi-test", PhiForCausalLM(cfg).eval(), 257)
    assert spec.parallel_residual and spec.shared_ln and spec.use_head_bias


def test_opt_logits_match_hf():
    import torch
    from transformers import OPTConfig, OPTForCausalLM

    torch.manual_seed(0)
    cfg = OPTConfig(
        vocab_size=257, hidden_size=48, ffn_dim=192, num_hidden_layers=3,
        num_attention_heads=4, max_position_embeddings=64,
        do_layer_norm_before=True, dropout=0.0, attention_dropout=0.0,
        word_embed_proj_dim=48)
    spec = _check("opt-test", OPTForCausalLM(cfg).eval(), 257)
    assert spec.activation == "relu" and spec.positional == "learned"


def test_gemma_logits_match_hf():
    import torch
    from transformers import GemmaConfig, GemmaForCausalLM

    torch.manual_seed(0)
    cfg = GemmaConfig(
        vocab_size=257, hidden_size=48, intermediate_size=96,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, max_position_embeddings=64, attention_dropout=0.0)
    spec = _check("gemma-test", GemmaForCausalLM(cfg).eval(), 257, atol=8e-3)
    assert spec.activation == "geglu" and spec.embed_scale is not None


def test_new_family_presets_validate():
    from mlio_tpu.models import get_spec

    for name in ("mistral-7b", "qwen2-7b", "pythia-1.4b", "phi-2",
                 "opt-1.3b", "gemma-7b", "neox-tiny"):
        get_spec(name).validate()


def test_neox_tiny_generates():
    """Decode path (cache + parallel residual + partial rope) runs."""
    import jax
    from mlio_tpu.models import get_spec, init_params
    from mlio_tpu.runtime.generate import greedy_generate

    spec = get_spec("neox-tiny")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = jnp.zeros((2, 4), jnp.int32)
    out = greedy_generate(params, spec, ids, max_new_tokens=4)
    assert out.shape == (2, 8)
