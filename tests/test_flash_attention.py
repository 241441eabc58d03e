"""Flash attention kernel vs dense reference (tolerance 1e-3, parity with the
reference's validate pattern, e.g. compare_with_standard_attention
flash_attention_kernels.py:1876)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlio_tpu.ops.flash_attention import flash_attention
from mlio_tpu.ops.reference import attention_reference


def _rand_qkv(key, B, Sq, Skv, Hq, Hkv, D, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, Sq, Hq, D), dtype)
    k = jax.random.normal(kk, (B, Skv, Hkv, D), dtype)
    v = jax.random.normal(kv, (B, Skv, Hkv, D), dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize(
    "B,Sq,Skv,Hq,Hkv,D",
    [
        (2, 256, 256, 4, 4, 64),     # MHA, even blocks
        (1, 200, 200, 4, 2, 64),     # GQA, ragged seq (padding path)
        (2, 128, 128, 4, 1, 64),     # MQA
        (1, 384, 384, 2, 2, 128),    # D=128
    ],
)
def test_flash_matches_dense(causal, B, Sq, Skv, Hq, Hkv, D):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), B, Sq, Skv, Hq, Hkv, D)
    out = flash_attention(q, k, v, causal=causal, block_q=128, block_kv=128,
                          interpret=True)
    ref = attention_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_flash_decode_with_cache_mask():
    """Sq=1 decode against a static cache with kv_len < Skv."""
    B, Smax, Hq, Hkv, D = 2, 128, 4, 2, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), B, 1, Smax, Hq, Hkv, D)
    kv_len = 37  # only the first 37 cache slots are valid
    out = flash_attention(q, k, v, causal=True, q_offset=kv_len - 1,
                          kv_len=kv_len, interpret=True)
    ref = attention_reference(q, k, v, causal=True, q_offset=kv_len - 1,
                              kv_len=kv_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_flash_prefill_chunk_with_offset():
    """Chunked prefill: queries at offset into a longer valid context."""
    B, Sq, Skv, Hq, Hkv, D = 1, 64, 256, 4, 4, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(2), B, Sq, Skv, Hq, Hkv, D)
    out = flash_attention(q, k, v, causal=True, q_offset=100, kv_len=164,
                          interpret=True)
    ref = attention_reference(q, k, v, causal=True, q_offset=100, kv_len=164)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_flash_per_batch_kv_len():
    B, Sq, Skv, Hq, Hkv, D = 3, 1, 64, 2, 2, 32
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), B, Sq, Skv, Hq, Hkv, D)
    kv_len = jnp.asarray([5, 17, 64], jnp.int32)
    out = flash_attention(q, k, v, causal=False, kv_len=kv_len, interpret=True)
    ref = attention_reference(q, k, v, causal=False, kv_len=kv_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_flash_bf16():
    B, Sq, Skv, Hq, Hkv, D = 1, 128, 128, 4, 4, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), B, Sq, Skv, Hq, Hkv, D,
                        dtype=jnp.bfloat16)
    out = flash_attention(q, k, v, causal=True, interpret=True)
    ref = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_flash_in_model_forward():
    """End-to-end: Impl(attention='flash') must match the dense model."""
    from mlio_tpu.models import Impl, forward, get_spec, init_params

    spec = get_spec("llama-tiny")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 0, spec.vocab_size)
    dense, _ = forward(params, spec, ids)
    flash, _ = forward(params, spec, ids, impl=Impl(attention="flash"))
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense),
                               rtol=1e-3, atol=1e-3)
