"""Fused MLP / norm / LN+QKV Pallas kernels vs jnp references.

Parity with the reference's validate functions: validate_fused_mlp
mlp_kernels.py:925 (tol 1e-3), compare_with_torch_layernorm
layernorm_kernels.py:428, compare_with_unfused_implementation
fused_layernorm_qkv.py:840.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlio_tpu.ops.fused_mlp import fused_mlp
from mlio_tpu.ops.norms import fused_norm
from mlio_tpu.ops.ln_qkv import fused_ln_qkv, fused_norm_matmul
from mlio_tpu.ops.reference import (
    layernorm_reference,
    mlp_reference,
    rmsnorm_reference,
)


@pytest.mark.parametrize("activation", ["gelu_new", "gelu", "relu", "swiglu"])
@pytest.mark.parametrize("bias", [True, False])
def test_fused_mlp_matches_reference(activation, bias):
    key = jax.random.PRNGKey(0)
    M, H, I = 100, 64, 160  # ragged on purpose (padding paths)
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (M, H))
    w_up = jax.random.normal(ks[1], (H, I)) * 0.1
    w_down = jax.random.normal(ks[2], (I, H)) * 0.1
    w_gate = jax.random.normal(ks[3], (H, I)) * 0.1 if activation == "swiglu" else None
    b_up = jax.random.normal(ks[4], (I,)) * 0.1 if bias else None
    b_gate = jax.random.normal(ks[5], (I,)) * 0.1 if (bias and activation == "swiglu") else None
    b_down = jax.random.normal(ks[5], (H,)) * 0.1 if bias else None

    out = fused_mlp(x, w_up, w_down, b_up=b_up, b_down=b_down, w_gate=w_gate,
                    b_gate=b_gate, activation=activation, block_m=64,
                    block_i=128, interpret=True)
    ref = mlp_reference(x, w_up, w_down, b_up=b_up, b_down=b_down,
                        w_gate=w_gate, b_gate=b_gate, activation=activation)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("kind", ["layernorm", "rmsnorm"])
@pytest.mark.parametrize("residual", [False, True])
def test_fused_norm_matches_reference(kind, residual):
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (3, 50, 96)) * 2.0 + 0.5
    scale = jax.random.normal(jax.random.PRNGKey(2), (96,)) + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(3), (96,)) * 0.1
    res = jax.random.normal(jax.random.PRNGKey(4), x.shape) if residual else None

    if kind == "layernorm":
        out = fused_norm(x, scale, bias, kind=kind, residual=res,
                         block_m=64, interpret=True)
        ref = layernorm_reference(x, scale, bias, residual=res)
    else:
        out = fused_norm(x, scale, None, kind=kind, residual=res,
                         block_m=64, interpret=True)
        ref = rmsnorm_reference(x, scale, residual=res)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kind", ["layernorm", "rmsnorm"])
def test_fused_norm_matmul(kind):
    x = jax.random.normal(jax.random.PRNGKey(0), (70, 64))
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 200)) * 0.1
    scale = jnp.ones((64,)) * 1.3
    bias = jnp.full((64,), 0.1) if kind == "layernorm" else None
    out = fused_norm_matmul(x, w, scale, bias, kind=kind, block_m=32,
                            block_n=128, interpret=True)
    if kind == "layernorm":
        ref = layernorm_reference(x, scale, bias) @ w
    else:
        ref = rmsnorm_reference(x, scale) @ w
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_fused_ln_qkv_gqa():
    H, qd, kvd = 64, 64, 32  # GQA: kv narrower than q
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 20, H))
    scale = jnp.ones((H,))
    wq = jax.random.normal(jax.random.PRNGKey(1), (H, qd)) * 0.1
    wk = jax.random.normal(jax.random.PRNGKey(2), (H, kvd)) * 0.1
    wv = jax.random.normal(jax.random.PRNGKey(3), (H, kvd)) * 0.1
    bq = jnp.full((qd,), 0.01)
    bk = jnp.full((kvd,), 0.02)
    bv = jnp.full((kvd,), 0.03)
    q, k, v = fused_ln_qkv(x, scale, None, wq, bq, wk, bk, wv, bv,
                           kind="rmsnorm", interpret=True)
    xn = rmsnorm_reference(x, scale)
    np.testing.assert_allclose(np.asarray(q), np.asarray(xn @ wq + bq),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(k), np.asarray(xn @ wk + bk),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(v), np.asarray(xn @ wv + bv),
                               rtol=1e-3, atol=1e-3)


def test_fused_impl_in_model():
    """Impl(mlp='fused', norm='fused', fused_ln_qkv=True) matches dense."""
    from mlio_tpu.models import Impl, forward, get_spec, init_params

    for name in ("gpt2-tiny", "llama-tiny"):
        spec = get_spec(name)
        params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, spec.vocab_size)
        dense, _ = forward(params, spec, ids)
        fused, _ = forward(params, spec, ids,
                           impl=Impl(mlp="fused", norm="fused",
                                     fused_ln_qkv=True))
        np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                                   rtol=1e-3, atol=1e-3)
