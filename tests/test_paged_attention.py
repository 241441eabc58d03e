"""PagedAttention kernel + reshape_and_cache vs dense reference
(parity: the reference's paged path, attention_kernels.py:628-905)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlio_tpu.ops.paged_attention import (
    init_kv_pools,
    paged_attention,
    paged_attention_reference,
    reshape_and_cache,
)
from mlio_tpu.ops.reference import attention_reference


def _setup(B=3, L=2, NB=32, Hkv=2, Hq=4, bs=16, D=64, seed=0):
    k_pool, v_pool = init_kv_pools(L, NB, Hkv, bs, D, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    # distinct context length per sequence; blocks allocated non-contiguously
    ctx = np.array([7, 30, 45][:B], np.int32)
    max_blocks = 4
    tables = np.zeros((B, max_blocks), np.int32)
    used = set()
    free = [b for b in range(1, NB)]
    rng.shuffle(free)
    for b in range(B):
        n = -(-int(ctx[b]) // bs)
        for j in range(n):
            tables[b, j] = free.pop()
    return k_pool, v_pool, jnp.asarray(tables), jnp.asarray(ctx), Hq, D


def test_reshape_and_cache_then_read_back():
    k_pool, v_pool, tables, ctx, Hq, D = _setup()
    B = tables.shape[0]
    Hkv = k_pool.shape[3]
    # write each sequence's full prefix (prefill-style chunked writes)
    key = jax.random.PRNGKey(0)
    S = int(ctx.max())
    k_new = jax.random.normal(key, (B, S, Hkv, D))
    v_new = jax.random.normal(jax.random.PRNGKey(1), (B, S, Hkv, D))
    for layer in range(k_pool.shape[0]):
        k_pool, v_pool = reshape_and_cache(
            k_pool, v_pool, k_new, v_new, tables,
            jnp.zeros((B,), jnp.int32), layer)
    # read back through the reference gather and compare valid positions
    kb = k_pool[0][tables]  # [B, max_blocks, bs, Hkv, D]
    k_read = kb.reshape(B, -1, Hkv, D)
    for b in range(B):
        n = int(ctx[b])
        np.testing.assert_allclose(np.asarray(k_read[b, :n]),
                                   np.asarray(k_new[b, :n]), rtol=1e-6)


@pytest.mark.parametrize("gqa", [1, 2, 4], ids=["mha", "gqa2", "gqa4"])
def test_paged_attention_matches_dense(gqa):
    B, L, NB, Hkv, bs, D = 3, 2, 32, 2, 16, 64
    Hq = Hkv * gqa
    k_pool, v_pool, tables, ctx, _, _ = _setup(B=B, L=L, NB=NB, Hkv=Hkv,
                                               bs=bs, D=D)
    # populate via reshape_and_cache
    S = int(ctx.max())
    k_new = jax.random.normal(jax.random.PRNGKey(2), (B, S, Hkv, D))
    v_new = jax.random.normal(jax.random.PRNGKey(3), (B, S, Hkv, D))
    layer = 1
    k_pool, v_pool = reshape_and_cache(k_pool, v_pool, k_new, v_new, tables,
                                       jnp.zeros((B,), jnp.int32), layer)
    q = jax.random.normal(jax.random.PRNGKey(4), (B, Hq, D))

    out = paged_attention(q, k_pool, v_pool, tables, ctx, layer=layer,
                          interpret=True)
    # dense ground truth from the raw k_new/v_new with per-batch kv_len
    ref = attention_reference(q[:, None], k_new, v_new, causal=False,
                              kv_len=ctx)[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # and the gather-based reference agrees too
    ref2 = paged_attention_reference(q, k_pool, v_pool, tables, ctx,
                                     layer=layer)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref2),
                               rtol=1e-5, atol=1e-5)


def test_paged_attention_single_token_context():
    """ctx=1: exactly one valid slot, everything else masked."""
    B, L, NB, Hkv, bs, D = 1, 1, 8, 2, 16, 32
    k_pool, v_pool = init_kv_pools(L, NB, Hkv, bs, D, dtype=jnp.float32)
    tables = jnp.asarray([[3, 0, 0, 0]], jnp.int32)
    ctx = jnp.asarray([1], jnp.int32)
    k_new = jax.random.normal(jax.random.PRNGKey(0), (1, 1, Hkv, D))
    v_new = jax.random.normal(jax.random.PRNGKey(1), (1, 1, Hkv, D))
    k_pool, v_pool = reshape_and_cache(k_pool, v_pool, k_new, v_new, tables,
                                       jnp.zeros((1,), jnp.int32), 0)
    q = jax.random.normal(jax.random.PRNGKey(2), (1, Hkv, D))
    out = paged_attention(q, k_pool, v_pool, tables, ctx, layer=0,
                          interpret=True)
    # softmax over one key = that key's value
    np.testing.assert_allclose(np.asarray(out), np.asarray(v_new[:, 0]),
                               rtol=1e-5, atol=1e-5)
