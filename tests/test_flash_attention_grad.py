"""Flash-attention backward vs dense-attention autodiff.

Parity model: the reference validates its Triton FA backward against
PyTorch autograd through dense attention (the _FlashAttentionFunction
autograd path, /root/reference/kernels/triton/flash_attention_kernels.py:
947-1147). Here the whole VJP (dQ, dK, dV Pallas kernels) is diffed against
jax.grad through an exact jnp softmax attention.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlio_tpu.ops.flash_attention_grad import flash_attention_vjp


def dense_attention(q, k, v, causal):
    B, Sq, Hq, D = q.shape
    _, Skv, Hkv, _ = k.shape
    group = Hq // Hkv
    kk = jnp.repeat(k, group, axis=2)
    vv = jnp.repeat(v, group, axis=2)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, kk) * (D ** -0.5)
    if causal:
        row = jnp.arange(Sq)[:, None]
        col = jnp.arange(Skv)[None, :]
        s = jnp.where(row >= col, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vv)


def loss_pair(q, k, v, causal):
    """(flash_loss_grads, dense_loss_grads) for a scalar test loss."""
    w = jnp.cos(jnp.arange(q.size, dtype=jnp.float32)).reshape(q.shape)

    def loss_flash(q, k, v):
        o = flash_attention_vjp(q, k, v, causal=causal, scale=None,
                                block_q=64, block_kv=128, interpret=True)
        return jnp.sum(o * w)

    def loss_dense(q, k, v):
        return jnp.sum(dense_attention(q, k, v, causal) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    return gf, gd


@pytest.mark.parametrize("causal", [True, False])
def test_grads_match_dense(rng, causal):
    B, S, H, D = 2, 128, 4, 64
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    (dq, dk, dv), (dq_r, dk_r, dv_r) = loss_pair(q, k, v, causal)
    for a, b in [(dq, dq_r), (dk, dk_r), (dv, dv_r)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_grads_gqa_and_ragged_shapes(rng):
    B, S, Hq, Hkv, D = 1, 96, 8, 2, 64  # S not a block multiple; GQA group 4
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    (dq, dk, dv), (dq_r, dk_r, dv_r) = loss_pair(q, k, v, True)
    for a, b in [(dq, dq_r), (dk, dk_r), (dv, dv_r)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_forward_matches_dense(rng):
    B, S, H, D = 2, 128, 4, 64
    q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    o = flash_attention_vjp(q, k, v, causal=True, scale=None,
                            block_q=64, block_kv=128, interpret=True)
    o_r = dense_attention(q, k, v, True)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_r),
                               rtol=2e-3, atol=2e-3)
