"""Pallas fused LayerNorm / RMSNorm (+ optional fused residual add).

TPU-native rebuild of the reference's Triton norm kernels
(/root/reference/kernels/triton/layernorm_kernels.py: _layernorm_fwd_kernel
:36-109, _layernorm_residual_fwd_kernel :112-184): one pass over each row
tile computing mean/var (or RMS) in fp32, normalize, scale(+bias), with the
residual add fused in so ``LN(x + residual)`` costs one HBM read of each
operand instead of a materialized intermediate.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _norm_kernel(x_ref, res_ref, scale_ref, bias_ref, o_ref, *, kind, eps,
                 has_residual, has_bias, alpha):
    x = x_ref[0].astype(jnp.float32)  # [bm, H]
    if has_residual:
        x = x + alpha * res_ref[0].astype(jnp.float32)
    if kind == "layernorm":
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + eps)
    else:  # rmsnorm
        ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        y = x * jax.lax.rsqrt(ms + eps)
    y = y * scale_ref[0].astype(jnp.float32)
    if has_bias:
        y = y + bias_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("kind", "eps", "residual_alpha", "block_m", "interpret"),
)
def fused_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    kind: str = "layernorm",
    eps: float = 1e-5,
    residual: Optional[jax.Array] = None,
    residual_alpha: float = 1.0,
    block_m: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Fused norm over the last axis. x [..., H] → [..., H].

    Wrapper parity: triton_layernorm layernorm_kernels.py:191-276.
    """
    orig_shape = x.shape
    H = x.shape[-1]
    x2 = x.reshape(-1, H)
    M = x2.shape[0]
    has_residual = residual is not None
    has_bias = bias is not None

    # VMEM-aware row block: in+out blocks are double-buffered, so keep each
    # at ~2MB or the default 16MB scoped-vmem limit blows at large H
    # (e.g. 7B prefill: [4096 rows, 4096] bf16 = 32MB per block otherwise).
    fit = max(8, (2 << 20) // (H * x.dtype.itemsize) // 8 * 8)
    bm = min(block_m, fit, _round_up(M, 8))
    m_pad = _round_up(M, bm)
    if m_pad != M:
        x2 = jnp.pad(x2, ((0, m_pad - M), (0, 0)))
    res2 = (residual.reshape(-1, H) if has_residual
            else jnp.zeros((1, H), x.dtype))
    if has_residual and m_pad != M:
        res2 = jnp.pad(res2, ((0, m_pad - M), (0, 0)))

    kernel = functools.partial(
        _norm_kernel, kind=kind, eps=eps, has_residual=has_residual,
        has_bias=has_bias, alpha=residual_alpha)

    out = pl.pallas_call(
        kernel,
        grid=(m_pad // bm,),
        in_specs=[
            pl.BlockSpec((1, bm, H), lambda m: (0, m, 0)),
            (pl.BlockSpec((1, bm, H), lambda m: (0, m, 0)) if has_residual
             else pl.BlockSpec((1, 1, H), lambda m: (0, 0, 0))),
            pl.BlockSpec((1, 1, H), lambda m: (0, 0, 0)),
            pl.BlockSpec((1, 1, H), lambda m: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bm, H), lambda m: (0, m, 0)),
        out_shape=jax.ShapeDtypeStruct((1, m_pad, H), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(
        x2[None],
        (res2 if has_residual else jnp.zeros((1, H), x.dtype))[None],
        scale.reshape(1, 1, H),
        (bias if has_bias else jnp.zeros((H,), x.dtype)).reshape(1, 1, H),
    )
    return out[0, :M].reshape(orig_shape)
