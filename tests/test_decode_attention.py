"""Batched contiguous decode attention vs dense reference."""
import jax.numpy as jnp
import numpy as np
import pytest

from mlio_tpu.ops.decode_attention import decode_attention, choose_decode_tiles
from mlio_tpu.ops.reference import attention_reference
from mlio_tpu.ops.quant import quantize_kv


def _dense(q, k_cache, v_cache, ctx, layer):
    B, Hq, D = q.shape
    k = k_cache[layer]
    v = v_cache[layer]
    out = attention_reference(q.reshape(B, 1, Hq, D), k, v,
                              causal=False, kv_len=ctx)
    return out[:, 0]


@pytest.mark.parametrize("gqa", [1, 4])
def test_matches_dense(rng, gqa):
    B, L, Smax, Hq, D = 4, 3, 256, 8, 64
    Hkv = Hq // gqa
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((L, B, Smax, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, B, Smax, Hkv, D)), jnp.float32)
    ctx = jnp.asarray([1, 17, 130, 256], jnp.int32)  # ragged contexts
    for layer in (0, 2):
        out = decode_attention(q, k, v, ctx, layer=layer, interpret=True)
        ref = _dense(q, k, v, ctx, layer)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)


def test_int8_kv_close_to_fp(rng):
    B, L, Smax, Hkv, D = 2, 2, 128, 4, 64
    q = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((L, B, Smax, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, B, Smax, Hkv, D)), jnp.float32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    ctx = jnp.asarray([40, 128], jnp.int32)
    out = decode_attention(q, kq, vq, ctx, layer=1, k_scales=ks, v_scales=vs,
                           interpret=True)
    ref = _dense(q, k, v, ctx, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_tile_chooser_respects_vmem():
    btile, bs = choose_decode_tiles(B=64, Smax=8192, Hkv=32, D=128)
    assert 64 % btile == 0 and 8192 % bs == 0
    # double-buffered K+V (Hkv/D already tile-aligned here) within budget
    assert 2 * 2 * btile * bs * 32 * 128 * 2 <= 24 << 20
    # small case: whole batch in one tile, ~8 blocks
    btile, bs = choose_decode_tiles(B=8, Smax=1024, Hkv=12, D=64)
    assert btile == 8 and bs == 128
