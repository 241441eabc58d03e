"""Pallas fused Norm + QKV projection.

TPU-native rebuild of the reference's fused LayerNorm+QKV Triton kernel
(/root/reference/kernels/triton/fused_layernorm_qkv.py:51-421, GQA-aware at
:58,102): the normalized activations are produced once into VMEM scratch and
consumed directly by the Q/K/V matmuls without an HBM round-trip.

Here Q, K and V projections are fused into ONE weight [H, q_dim + 2*kv_dim]
(concatenated at trace time — XLA folds the concat of constant weights), so
GQA comes out naturally from the widths, matching the reference's
flash_compatible_wrapper that splits combined QKV weight (:1073).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_matmul_kernel(x_ref, w_ref, scale_ref, bias_ref, o_ref, xn_ref, *,
                      kind, eps, has_bias):
    n = pl.program_id(1)

    # Normalize the x tile once (at the first n step), keep it in scratch.
    @pl.when(n == 0)
    def _():
        x = x_ref[0].astype(jnp.float32)
        if kind == "layernorm":
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
            y = (x - mean) * jax.lax.rsqrt(var + eps)
        else:
            ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
            y = x * jax.lax.rsqrt(ms + eps)
        y = y * scale_ref[0].astype(jnp.float32)
        if has_bias:
            y = y + bias_ref[0].astype(jnp.float32)
        xn_ref[:] = y.astype(xn_ref.dtype)

    o_ref[0] = lax.dot_general(
        xn_ref[:], w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("kind", "eps", "block_m", "block_n", "interpret"),
)
def fused_norm_matmul(
    x: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    kind: str = "layernorm",
    eps: float = 1e-5,
    block_m: int = 512,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """norm(x) @ w in one kernel. x [..., H], w [H, N] → [..., N]."""
    orig_shape = x.shape
    H = x.shape[-1]
    N = w.shape[1]
    x2 = x.reshape(-1, H)
    M = x2.shape[0]
    has_bias = bias is not None

    bm = min(block_m, _round_up(M, 8))
    bn = min(block_n, _round_up(N, 128))
    m_pad, n_pad = _round_up(M, bm), _round_up(N, bn)
    if m_pad != M:
        x2 = jnp.pad(x2, ((0, m_pad - M), (0, 0)))
    if n_pad != N:
        w = jnp.pad(w, ((0, 0), (0, n_pad - N)))

    kernel = functools.partial(_ln_matmul_kernel, kind=kind, eps=eps,
                               has_bias=has_bias)
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // bm, n_pad // bn),
        in_specs=[
            pl.BlockSpec((1, bm, H), lambda m, n: (0, m, 0)),
            pl.BlockSpec((1, H, bn), lambda m, n: (0, 0, n)),
            pl.BlockSpec((1, 1, H), lambda m, n: (0, 0, 0)),
            pl.BlockSpec((1, 1, H), lambda m, n: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bm, bn), lambda m, n: (0, m, n)),
        out_shape=jax.ShapeDtypeStruct((1, m_pad, n_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, H), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        x2[None], w[None], scale.reshape(1, 1, H),
        (bias if has_bias else jnp.zeros((H,), x.dtype)).reshape(1, 1, H),
    )
    return out[0, :M, :N].reshape(orig_shape[:-1] + (N,))


def fused_ln_qkv(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: Optional[jax.Array],
    wq: jax.Array,
    bq: Optional[jax.Array],
    wk: jax.Array,
    bk: Optional[jax.Array],
    wv: jax.Array,
    bv: Optional[jax.Array],
    *,
    kind: str = "layernorm",
    eps: float = 1e-5,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused norm + Q/K/V projections (wrapper parity:
    triton_fused_layernorm_qkv fused_layernorm_qkv.py:422)."""
    qd, kvd = wq.shape[1], wk.shape[1]
    w = jnp.concatenate([wq, wk, wv], axis=1)
    out = fused_norm_matmul(x, w, ln_scale, ln_bias, kind=kind, eps=eps,
                            interpret=interpret)
    q, k, v = out[..., :qd], out[..., qd:qd + kvd], out[..., qd + kvd:]
    if bq is not None:
        q = q + bq
        k = k + bk
        v = v + bv
    return q, k, v
