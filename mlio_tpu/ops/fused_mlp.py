"""Pallas fused MLP: up-projection → activation (→ SwiGLU gate) → down-projection.

TPU-native rebuild of the reference's Triton fused-MLP kernels
(/root/reference/kernels/triton/mlp_kernels.py: _fused_mlp_gelu_kernel :27,
_fused_mlp_relu_kernel :233, _fused_mlp_swiglu_kernel :417): the activation
and both matmuls run in one kernel so the [M, intermediate] activation tensor
never round-trips to HBM — that is the 40-60% bandwidth saving the reference
claims (README.md:111).

Layout: grid = (M_tiles, I_tiles). Per program: one [bm, H] x tile stays
VMEM-resident across the I dimension (index map ignores i), weight blocks
w_up[:, i-block] / w_down[i-block, :] stream through VMEM with automatic
double-buffering, and the output [bm, H] block accumulates across the
(sequential) i dimension — MXU-sized tiles everywhere, no scalar loops.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _activate(h, gate, activation):
    hf = h.astype(jnp.float32)
    if activation == "swiglu":
        g = gate.astype(jnp.float32)
        return jax.nn.silu(g) * hf
    if activation == "geglu":
        g = gate.astype(jnp.float32)
        return jax.nn.gelu(g, approximate=True) * hf
    if activation in ("gelu_new", "gelu_tanh"):
        return jax.nn.gelu(hf, approximate=True)
    if activation == "gelu":
        return jax.nn.gelu(hf, approximate=False)
    if activation == "relu":
        return jnp.maximum(hf, 0.0)
    raise ValueError(f"unknown activation {activation}")


def _fused_mlp_kernel(x_ref, wu_ref, wd_ref, bu_ref, bg_ref, wg_ref,
                      o_ref, acc_ref, *, activation, has_bias, has_gate,
                      n_i):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0]  # [bm, H]
    h = lax.dot_general(x, wu_ref[0], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [bm, bi]
    if has_bias:
        h = h + bu_ref[0].astype(jnp.float32)
    if has_gate:
        g = lax.dot_general(x, wg_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        if has_bias:
            g = g + bg_ref[0].astype(jnp.float32)
        a = _activate(h, g, activation)
    else:
        a = _activate(h, None, activation)
    a = a.astype(x.dtype)
    acc_ref[:] += lax.dot_general(a, wd_ref[0], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

    @pl.when(i == n_i - 1)
    def _():
        o_ref[0] = acc_ref[:].astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("activation", "block_m", "block_i", "interpret"),
)
def fused_mlp(
    x: jax.Array,
    w_up: jax.Array,
    w_down: jax.Array,
    *,
    b_up: Optional[jax.Array] = None,
    b_down: Optional[jax.Array] = None,
    w_gate: Optional[jax.Array] = None,
    b_gate: Optional[jax.Array] = None,
    activation: str = "gelu_new",
    block_m: int = 512,
    block_i: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Fused MLP. x [..., H], w_up [H, I], w_down [I, H] → [..., H].

    Wrapper parity: triton_fused_mlp mlp_kernels.py:648-756 (shape handling,
    block heuristics mlp_kernels.py:699-701).
    """
    orig_shape = x.shape
    H = x.shape[-1]
    I = w_up.shape[1]
    x2 = x.reshape(-1, H)
    M = x2.shape[0]
    has_gate = w_gate is not None
    has_bias = b_up is not None

    bm = min(block_m, _round_up(M, 8))
    bi = min(block_i, _round_up(I, 128))
    m_pad = _round_up(M, bm)
    i_pad = _round_up(I, bi)
    if m_pad != M:
        x2 = jnp.pad(x2, ((0, m_pad - M), (0, 0)))
    if i_pad != I:
        w_up = jnp.pad(w_up, ((0, 0), (0, i_pad - I)))
        w_down = jnp.pad(w_down, ((0, i_pad - I), (0, 0)))
        if has_gate:
            w_gate = jnp.pad(w_gate, ((0, 0), (0, i_pad - I)))
        if has_bias:
            b_up = jnp.pad(b_up, ((0, i_pad - I),))
            if b_gate is not None:
                b_gate = jnp.pad(b_gate, ((0, i_pad - I),))

    n_m, n_i = m_pad // bm, i_pad // bi
    # Dummy 1-wide stand-ins keep the kernel signature static when bias/gate
    # are absent (pallas needs concrete operands).
    bu = b_up.reshape(1, i_pad) if has_bias else jnp.zeros((1, i_pad), x.dtype)
    bg = (b_gate.reshape(1, i_pad) if (has_bias and b_gate is not None)
          else jnp.zeros((1, i_pad), x.dtype))
    wg = w_gate if has_gate else jnp.zeros((H, bi), x.dtype)

    kernel = functools.partial(
        _fused_mlp_kernel, activation=activation, has_bias=has_bias,
        has_gate=has_gate, n_i=n_i)

    out = pl.pallas_call(
        kernel,
        grid=(n_m, n_i),
        in_specs=[
            pl.BlockSpec((1, bm, H), lambda m, i: (0, m, 0)),
            pl.BlockSpec((1, H, bi), lambda m, i: (0, 0, i)),
            pl.BlockSpec((1, bi, H), lambda m, i: (0, i, 0)),
            pl.BlockSpec((1, 1, bi), lambda m, i: (0, 0, i)),
            pl.BlockSpec((1, 1, bi), lambda m, i: (0, 0, i)),
            pl.BlockSpec((1, H, bi),
                         (lambda m, i: (0, 0, i)) if has_gate else
                         (lambda m, i: (0, 0, 0))),
        ],
        out_specs=pl.BlockSpec((1, bm, H), lambda m, i: (0, m, 0)),
        out_shape=jax.ShapeDtypeStruct((1, m_pad, H), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * H * I * (3 if has_gate else 2),
            bytes_accessed=(x2.size + w_up.size + w_down.size) * x2.dtype.itemsize,
            transcendentals=M * I,
        ),
        interpret=interpret,
    )(x2[None], w_up[None], w_down[None], bu[None], bg[None], wg[None])

    out = out[0, :M]
    if b_down is not None:
        out = out + b_down
    return out.reshape(orig_shape)
