"""PagedAttention decode kernel + reshape-and-cache for TPU.

Rebuild of the reference's paged Triton kernels
(/root/reference/kernels/triton/attention_kernels.py:
_paged_attention_fwd_kernel :628-808, _reshape_and_cache_kernel :811-905,
wrappers :1206-1410) — decode attention over a non-contiguous KV cache
addressed through per-sequence block tables.

TPU-native design:
  * Pool layout [L, num_blocks, block_size, H_kv, D] (vs the reference's
    [blocks, layers, bs, H, d]): one physical block is a contiguous
    [block_size, H_kv * D] slab, so each grid step issues ONE large DMA
    (e.g. 128 KB for bs=16, Hkv=32, D=128 bf16) instead of a
    latency-bound 4 KB fetch per head — decode attention is HBM-bound and
    lives or dies on DMA size.
  * The block table and context lengths are scalar-prefetch args; the K/V
    BlockSpec *index maps* read the table, so Pallas's pipeline DMAs exactly
    the physical block each grid step needs (the reference does this gather
    with explicit pointer arithmetic, attention_kernels.py:726-736).
  * Beyond-context grid steps clamp the index map to the last valid block —
    consecutive identical indices skip the re-fetch — and the compute is
    masked out.
  * Online softmax in fp32 scratch across the (sequential) block grid axis;
    GQA via batched dots over the kv-head dim (query heads grouped).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def init_kv_pools(num_layers: int, num_blocks: int, num_kv_heads: int,
                  block_size: int, head_dim: int, dtype=jnp.bfloat16,
                  quant: Optional[str] = None):
    """Allocate K/V pools [L, NB, bs, Hkv, D].

    ``quant="int8"`` returns (k, v, k_scale, v_scale) with int8 pools and
    per-(slot, head) fp32 scale pools [L, NB, bs, Hkv]."""
    shape = (num_layers, num_blocks, block_size, num_kv_heads, head_dim)
    if quant == "int8":
        sshape = shape[:-1]
        return (jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                jnp.ones(sshape, jnp.float32), jnp.ones(sshape, jnp.float32))
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def _scatter_scales(pool: jax.Array, scales: jax.Array, flat_idx: jax.Array,
                    B: int, S_new: int, Hkv: int) -> jax.Array:
    """Scatter [B, S_new, Hkv] scales into a [L, NB, bs, Hkv] pool."""
    dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(1,),
        inserted_window_dims=(0, 1, 2),
        scatter_dims_to_operand_dims=(0, 1, 2),
    )
    upd = scales.reshape(B * S_new, Hkv)
    return lax.scatter(pool, flat_idx, upd.astype(pool.dtype), dnums,
                       indices_are_sorted=False, unique_indices=True,
                       mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def reshape_and_cache_quant(
    k_pool, v_pool, ks_pool, vs_pool,
    k_new, v_new, block_tables, write_pos, layer,
):
    """INT8 variant: quantize per (token, head), write values + scales."""
    from mlio_tpu.ops.quant import quantize_kv

    B, S_new, Hkv, D = k_new.shape
    bs = k_pool.shape[2]
    kq, ksc = quantize_kv(k_new)
    vq, vsc = quantize_kv(v_new)
    k_pool, v_pool = reshape_and_cache(k_pool, v_pool, kq, vq, block_tables,
                                       write_pos, layer)
    pos = write_pos[:, None] + jnp.arange(S_new)[None, :]
    logical = pos // bs
    offset = pos % bs
    physical = jnp.take_along_axis(block_tables, logical, axis=1)
    flat_idx = jnp.stack([
        jnp.broadcast_to(jnp.asarray(layer, jnp.int32), (B, S_new)),
        physical, offset], axis=-1).reshape(-1, 3)
    ks_pool = _scatter_scales(ks_pool, ksc, flat_idx, B, S_new, Hkv)
    vs_pool = _scatter_scales(vs_pool, vsc, flat_idx, B, S_new, Hkv)
    return k_pool, v_pool, ks_pool, vs_pool


# ---------------------------------------------------------------------------
# reshape_and_cache: scatter new tokens' K/V into the pools
# ---------------------------------------------------------------------------

def reshape_and_cache(
    k_pool: jax.Array,      # [L, NB, bs, Hkv, D]
    v_pool: jax.Array,
    k_new: jax.Array,       # [B, S_new, Hkv, D]
    v_new: jax.Array,
    block_tables: jax.Array,  # [B, max_blocks] int32
    write_pos: jax.Array,     # [B] int32: absolute position of k_new[:, 0]
    layer,
) -> Tuple[jax.Array, jax.Array]:
    """Write S_new tokens per sequence into the paged pools.

    Functional scatter; jit callers should donate the pools so XLA updates
    in place. The Triton reference writes one decode token (q_seq_len==1
    assumed, attention_kernels.py:1363-1365) — this generalizes to chunked
    prefill writes.
    """
    B, S_new, Hkv, D = k_new.shape
    bs = k_pool.shape[2]
    pos = write_pos[:, None] + jnp.arange(S_new)[None, :]  # [B, S_new]
    logical = pos // bs
    offset = pos % bs
    physical = jnp.take_along_axis(block_tables, logical, axis=1)  # [B, S_new]

    flat_idx = jnp.stack([
        jnp.broadcast_to(jnp.asarray(layer, jnp.int32), (B, S_new)),
        physical,
        offset,
    ], axis=-1).reshape(-1, 3)  # indexes dims (L, NB, bs)

    upd_k = k_new.reshape(B * S_new, Hkv, D)
    upd_v = v_new.reshape(B * S_new, Hkv, D)

    dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2),            # (Hkv, D) of each update row
        inserted_window_dims=(0, 1, 2),       # L, NB, bs are indexed away
        scatter_dims_to_operand_dims=(0, 1, 2),
    )
    k_pool = lax.scatter(k_pool, flat_idx, upd_k.astype(k_pool.dtype), dnums,
                         indices_are_sorted=False, unique_indices=True,
                         mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    v_pool = lax.scatter(v_pool, flat_idx, upd_v.astype(v_pool.dtype), dnums,
                         indices_are_sorted=False, unique_indices=True,
                         mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    return k_pool, v_pool


def reshape_and_cache_flat(
    pool: jax.Array,        # [L, NB, bsz, W] FLAT head layout
    new: jax.Array,         # [B, S_new, W] (W = Hkv*D, or 2*Hkv*D combined)
    block_tables: jax.Array,
    write_pos: jax.Array,
    layer,
) -> jax.Array:
    """Flat-pool twin of reshape_and_cache for the paged megakernel's pool
    layout (ops/decode_paged_stack.py): rows stay [W] so no head split."""
    B, S_new, W = new.shape
    bs = pool.shape[2]
    pos = write_pos[:, None] + jnp.arange(S_new)[None, :]
    logical = pos // bs
    offset = pos % bs
    physical = jnp.take_along_axis(block_tables, logical, axis=1)
    flat_idx = jnp.stack([
        jnp.broadcast_to(jnp.asarray(layer, jnp.int32), (B, S_new)),
        physical, offset], axis=-1).reshape(-1, 3)
    dnums = lax.ScatterDimensionNumbers(
        update_window_dims=(1,),
        inserted_window_dims=(0, 1, 2),
        scatter_dims_to_operand_dims=(0, 1, 2),
    )
    return lax.scatter(pool, flat_idx,
                       new.reshape(B * S_new, W).astype(pool.dtype), dnums,
                       indices_are_sorted=False, unique_indices=True,
                       mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)


# ---------------------------------------------------------------------------
# Paged decode attention kernel
# ---------------------------------------------------------------------------

def _paged_attn_kernel(tables_ref, ctx_ref, layer_ref, q_ref, k_ref, v_ref,
                       *refs, block_size, scale, n_blocks, kv_quant=False):
    if kv_quant:
        ksc_ref, vsc_ref, o_ref, m_ref, l_ref, acc_ref = refs
    else:
        o_ref, m_ref, l_ref, acc_ref = refs
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ctx = ctx_ref[b]
    start = j * block_size

    @pl.when(start < ctx)
    def _():
        q = q_ref[0]             # [Hkv, G, D]
        ks = k_ref[0, 0]         # [bs, Hkv, D]
        vs = v_ref[0, 0]
        # Keep D on the lane dim: elementwise mult + lane-reduce vectorizes
        # on the VPU where a G=1 batched dot would use 1 sublane.
        qf = q.astype(jnp.float32) * scale            # [Hkv, G, D]
        kf = ks.astype(jnp.float32).swapaxes(0, 1)    # [Hkv, bs, D]
        if kv_quant:
            # dequant fused: int8 values * per-(slot, head) scale
            kf = kf * ksc_ref[0, 0].swapaxes(0, 1)[:, :, None]
        s = jnp.sum(qf[:, :, None, :] * kf[:, None, :, :], axis=-1)
        # s: [Hkv, G, bs]
        col = start + lax.broadcasted_iota(jnp.int32, s.shape, 2)
        mask = col < ctx
        s = jnp.where(mask, s, NEG_INF)
        m = m_ref[:]
        l = l_ref[:]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.where(jnp.isneginf(m), 0.0, jnp.exp(m - m_new))
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        l_ref[:] = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        vf = vs.astype(jnp.float32).swapaxes(0, 1)    # [Hkv, bs, D]
        if kv_quant:
            vf = vf * vsc_ref[0, 0].swapaxes(0, 1)[:, :, None]
        pv = jnp.sum(p[:, :, :, None] * vf[:, None, :, :], axis=2)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(j == n_blocks - 1)
    def _():
        l_safe = jnp.where(l_ref[:] == 0.0, 1.0, l_ref[:])
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "interpret"),
)
def paged_attention(
    q: jax.Array,             # [B, Hq, D] — one decode token per sequence
    k_pool: jax.Array,        # [L, NB, bs, Hkv, D]
    v_pool: jax.Array,
    block_tables: jax.Array,  # [B, max_blocks] int32
    context_lens: jax.Array,  # [B] int32 (length INCLUDING current token)
    *,
    layer,
    scale: Optional[float] = None,
    k_scale_pool: Optional[jax.Array] = None,  # [L, NB, bs, Hkv] (int8 KV)
    v_scale_pool: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Decode attention over the paged cache → [B, Hq, D].

    Wrapper parity: triton_paged_attention_forward
    attention_kernels.py:1206-1311 (int32 table assert, decode grid).
    ``layer`` may be a traced int32 scalar (used inside lax.scan over layers).
    """
    B, Hq, D = q.shape
    L, NB, bs, Hkv, _ = k_pool.shape
    G = Hq // Hkv
    max_blocks = block_tables.shape[1]
    assert block_tables.dtype == jnp.int32
    if scale is None:
        scale = D ** -0.5

    qg = q.reshape(B, Hkv, G, D)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    def kv_index(b, j, tables, ctx, layer_ref):
        # Clamp beyond-context steps to the last valid block: identical
        # consecutive indices → Pallas skips the redundant DMA.
        last = jnp.maximum(ctx[b] - 1, 0) // bs
        jj = jnp.minimum(j, last)
        return (layer_ref[0], tables[b, jj], 0, 0, 0)

    grid = (B, max_blocks)
    kv_quant = k_scale_pool is not None

    def sc_index(b, j, tables, ctx, layer_ref):
        last = jnp.maximum(ctx[b] - 1, 0) // bs
        jj = jnp.minimum(j, last)
        return (layer_ref[0], tables[b, jj], 0, 0)

    in_specs = [
        pl.BlockSpec((1, Hkv, G, D), lambda b, j, *_: (b, 0, 0, 0)),
        pl.BlockSpec((1, 1, bs, Hkv, D), kv_index),
        pl.BlockSpec((1, 1, bs, Hkv, D), kv_index),
    ]
    operands = [qg, k_pool, v_pool]
    if kv_quant:
        in_specs += [pl.BlockSpec((1, 1, bs, Hkv), sc_index),
                     pl.BlockSpec((1, 1, bs, Hkv), sc_index)]
        operands += [k_scale_pool, v_scale_pool]

    out = pl.pallas_call(
        functools.partial(_paged_attn_kernel, block_size=bs, scale=scale,
                          n_blocks=max_blocks, kv_quant=kv_quant),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, Hkv, G, D),
                                   lambda b, j, *_: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((Hkv, G, 1), jnp.float32),
                pltpu.VMEM((Hkv, G, 1), jnp.float32),
                pltpu.VMEM((Hkv, G, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(block_tables, context_lens, layer_arr, *operands)
    return out.reshape(B, Hq, D)


def paged_attention_reference(q, k_pool, v_pool, block_tables, context_lens,
                              *, layer, scale=None):
    """jnp reference: gather the cache densely, run masked attention
    (parity: the PyTorch fallback attention_kernels.py:1519-1626)."""
    from mlio_tpu.ops.reference import attention_reference

    B, Hq, D = q.shape
    L, NB, bs, Hkv, _ = k_pool.shape
    max_blocks = block_tables.shape[1]
    S = max_blocks * bs
    kb = k_pool[layer][block_tables]  # [B, max_blocks, bs, Hkv, D]
    vb = v_pool[layer][block_tables]
    k = kb.reshape(B, S, Hkv, D)
    v = vb.reshape(B, S, Hkv, D)
    out = attention_reference(q.reshape(B, 1, Hq, D), k, v,
                              causal=False, scale=scale, kv_len=context_lens)
    return out[:, 0]
