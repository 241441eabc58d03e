"""Paged decode megakernel (ops/decode_paged_stack.py) vs the per-op paged
decode path.

The engine's serving hot loop: one pallas_call per decode step over the
block-table pools (flat layout, per-sequence contexts, in-kernel aliased
cache writes, fused lm_head epilogue). These tests run both engine decode
backends in interpreter mode on CPU (f32) and require EXACT token
agreement across model families, multi-step scheduling, combined pools and
sampling methods — the per-op path (runtime/paged_forward.py) is the
already-differential-tested reference.
"""
import dataclasses

import jax
import jax.numpy as jnp
import pytest

from mlio_tpu.models import get_spec, init_params
from mlio_tpu.runtime.engine import InferenceEngine
from mlio_tpu.runtime.sampling import SamplingMethod

PROMPTS = [[3, 1, 4, 1, 5], [9, 2, 6], [5, 3, 5, 8, 9, 7, 9], [2]]


def _run(spec, params, stack, *, steps=1, method=None, max_new=8,
         rng=None):
    eng = InferenceEngine(spec, params, max_batch=4, max_seq_len=64,
                          block_size=16, dtype=jnp.float32,
                          decode_stack=stack, steps_per_dispatch=steps,
                          method=method or SamplingMethod(), rng=rng)
    assert eng.decode_stack == stack
    return eng, eng.run(PROMPTS, max_new_tokens=max_new)


@pytest.mark.parametrize("name", ["gpt2-tiny", "llama-tiny"])
def test_paged_mega_matches_perop(name):
    """Learned-pos LN biases (gpt2) and RoPE GQA RMSNorm SwiGLU (llama)."""
    spec = get_spec(name)
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    _, ref = _run(spec, params, "perop")
    _, got = _run(spec, params, "mega")
    assert ref == got


def test_paged_mega_multi_step():
    """steps_per_dispatch > 1: whole decode chunks run device-side through
    the megakernel scan; outputs stay exact."""
    spec = get_spec("llama-tiny")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    _, ref = _run(spec, params, "perop", steps=8, max_new=11)
    _, got = _run(spec, params, "mega", steps=8, max_new=11)
    assert ref == got


def test_paged_mega_combined_pools():
    """kv_dim % 128 == 0 packs k|v on one pool's lanes (one DMA per block
    per sequence)."""
    spec = dataclasses.replace(get_spec("llama-tiny"), name="ctest",
                               hidden_size=128, num_heads=2, num_kv_heads=2,
                               head_dim=64, intermediate_size=256)
    params = init_params(spec, jax.random.PRNGKey(1), dtype=jnp.float32)
    _, ref = _run(spec, params, "perop", steps=4, max_new=9)
    eng, got = _run(spec, params, "mega", steps=4, max_new=9)
    assert eng.kv_combined
    assert ref == got


def test_paged_mega_sampling():
    """Non-greedy methods take the kernel's streamed-logits output; the rng
    stream advances identically (one split per dispatch), so draws match
    the per-op backend exactly."""
    spec = get_spec("llama-tiny")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    m = SamplingMethod(temperature=1.0, top_k=8)
    _, ref = _run(spec, params, "perop", steps=4, method=m, max_new=9,
                  rng=jax.random.PRNGKey(7))
    _, got = _run(spec, params, "mega", steps=4, method=m, max_new=9,
                  rng=jax.random.PRNGKey(7))
    assert ref == got


def test_paged_mega_continuous_batching_waves():
    """More requests than slots: admission waves + slot reuse keep outputs
    exact per request id."""
    spec = get_spec("gpt2-tiny")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    prompts = [[i + 1, i + 2, i + 3] for i in range(10)]
    outs = {}
    for stack in ("perop", "mega"):
        eng = InferenceEngine(spec, params, max_batch=4, max_seq_len=32,
                              block_size=16, dtype=jnp.float32,
                              decode_stack=stack, steps_per_dispatch=4)
        outs[stack] = eng.run(prompts, max_new_tokens=6)
    assert outs["perop"] == outs["mega"]


def test_paged_mega_fallback_for_unsupported():
    """MoE specs don't fit the megakernel: auto falls back to per-op."""
    spec = dataclasses.replace(get_spec("llama-tiny"), name="moe",
                               num_experts=4)
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = InferenceEngine(spec, params, max_batch=2, max_seq_len=32,
                          block_size=16, dtype=jnp.float32)
    assert eng.decode_stack == "perop"
