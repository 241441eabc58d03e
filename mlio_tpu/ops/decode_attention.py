"""Batched contiguous-cache decode attention (S==1) for TPU.

The paged kernel (ops/paged_attention.py) is addressed through per-sequence
block tables, so its grid is (B, max_blocks) and every step DMAs one
sequence's block — correct for fragmented pools, but decode over the
*contiguous* generate cache ([L, B, Smax, Hkv, D]) doesn't need the
indirection: the j-th time-slice of ALL sequences is one contiguous region
per sequence. This kernel fetches [btile, bs, Hkv, D] per grid step —
batching the DMA across sequences — so the grid is (B/btile, Smax/bs)
instead of (B, Smax/bs): ~btile× fewer sequential grid steps and ~btile×
larger contiguous DMAs. Decode is HBM-latency-bound; both factors go
straight into tokens/sec.

Layout note (measured on v5e): keeping the cache sequence-major
([.., Smax, Hkv, D], each grid step = btile contiguous ~200KB slabs) and
transposing K/V once in VMEM beats a head-major cache ([.., Hkv, Smax, D],
whose grid step gathers B*Hkv small strided slabs) by ~1.7× end-to-end —
DMA contiguity matters more than avoiding the in-VMEM relayout.

Capability parity: same math as the reference's decode attention
(_paged_attention_fwd_kernel, /root/reference/kernels/triton/
attention_kernels.py:628-808) specialized to the contiguous-cache case the
reference's legacy KVCache serves (/root/reference/baseline/inference.py:
791-1037); INT8 KV dequant is fused as in ops/flash_attention.py.

Beyond-context blocks clamp the index map to the last valid block —
consecutive identical indices skip the re-fetch — so only ~ctx/bs blocks
actually cross HBM.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")

_VMEM_LIMIT = 64 << 20  # raised Mosaic scoped-vmem limit (v5e: 128MB physical)


def _pad(x: int, m: int) -> int:
    return -(-x // m) * m


def _decode_kernel(tmax_ref, layer_ref, ctx_ref, q_ref, k_ref, v_ref, *refs,
                   block_size, scale, n_blocks, btile, kv_quant=False):
    if kv_quant:
        ksc_ref, vsc_ref, o_ref, m_ref, l_ref, acc_ref = refs
    else:
        o_ref, m_ref, l_ref, acc_ref = refs
    bi = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    start = j * block_size
    G = q_ref.shape[2]

    @pl.when(start < tmax_ref[bi])
    def _():
        q = q_ref[...]                                       # [bt, Hkv, G, D]
        ks = k_ref[0]                                        # [bt, bs, Hkv, D]
        vs = v_ref[0]
        # mask: ctx arrives [btile, 1] in VMEM (SMEM loads must be scalar).
        if G == 1:
            # MHA/decode-G=1 fast path: pure VPU mult-reduce in the cache's
            # native layout — zero in-VMEM relayouts of the K/V block. The
            # fp32 temp is [bt, bs, Hkv, D] (~3MB at gpt2 tiles), well under
            # the raised vmem limit.
            qx = (q.astype(jnp.float32) * scale)[:, :, 0, :]  # [bt, Hkv, D]
            s = jnp.sum(ks.astype(jnp.float32) * qx[:, None, :, :], axis=-1)
            # s: [bt, bs, Hkv]
            if kv_quant:
                s = s * ksc_ref[0]                           # [bt, bs, Hkv]
            ctx = ctx_ref[...][:, :, None]                   # [bt, 1, 1]
            col = start + lax.broadcasted_iota(jnp.int32, s.shape, 1)
            mask = col < ctx
            s = jnp.where(mask, s, NEG_INF)
            m = m_ref[:]                                     # [bt, 1, Hkv]
            l = l_ref[:]
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.where(jnp.isneginf(m), 0.0, jnp.exp(m - m_new))
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)     # [bt, bs, Hkv]
            l_ref[:] = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            if kv_quant:
                p = p * vsc_ref[0]
            pv = jnp.sum(p[..., None] * vs.astype(jnp.float32), axis=1)
            # pv: [bt, Hkv, D]; acc scratch is [bt, Hkv, D] in this mode.
            acc_ref[:] = acc_ref[:] * alpha.reshape(
                alpha.shape[0], -1, 1) + pv
            m_ref[:] = m_new
            return
        qf = (q.astype(jnp.float32) * scale).astype(
            jnp.bfloat16 if kv_quant else q.dtype)
        if kv_quant:
            ks = ks.astype(jnp.bfloat16)
            vs = vs.astype(jnp.bfloat16)
        # GQA path: one in-VMEM relayout to head-major, then per-sequence
        # dots batched over Hkv (Mosaic supports a single batch dim, same
        # position on both operands). The MXU contracts D / bs without
        # materializing an outer product (a [bt,Hkv,G,bs,D] fp32 temp would
        # blow the VMEM stack).
        kt = ks.swapaxes(1, 2)                               # [bt, Hkv, bs, D]
        vt = vs.swapaxes(1, 2)
        # scores [bt, Hkv, G, bs]: per b, batch Hkv (dim 0 on both sides).
        s = jnp.stack([
            lax.dot_general(qf[b], kt[b], (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
            for b in range(btile)])
        if kv_quant:
            # dequant fused: per-(slot, head) K scale applied post-dot
            s = s * ksc_ref[0].swapaxes(1, 2)[:, :, None, :]
        ctx = ctx_ref[...][:, :, None, None]                 # [bt, 1, 1, 1]
        col = start + lax.broadcasted_iota(jnp.int32, s.shape, 3)
        mask = col < ctx
        s = jnp.where(mask, s, NEG_INF)
        m = m_ref[:]
        l = l_ref[:]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.where(jnp.isneginf(m), 0.0, jnp.exp(m - m_new))
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        l_ref[:] = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if kv_quant:
            # V scale folded into p so the dot stays int8-sourced bf16
            p = p * vsc_ref[0].swapaxes(1, 2)[:, :, None, :]
        # pv [bt, Hkv, G, D]: per b contract bs, batch Hkv (dim 0 both sides).
        pb = p.astype(vt.dtype)
        pv = jnp.stack([
            lax.dot_general(pb[b], vt[b], (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
            for b in range(btile)])
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(j == n_blocks - 1)
    def _():
        l_safe = jnp.where(l_ref[:] == 0.0, 1.0, l_ref[:])
        if G == 1:
            # scratch: m/l [bt, 1, Hkv], acc [bt, Hkv, D]
            o = acc_ref[:] / l_safe.reshape(l_safe.shape[0], -1, 1)
            o_ref[...] = o[:, :, None, :].astype(o_ref.dtype)
        else:
            o_ref[...] = (acc_ref[:] / l_safe).astype(o_ref.dtype)


def choose_decode_tiles(B: int, Smax: int, Hkv: int, D: int,
                        itemsize: int = 2, vmem_budget: int = 24 << 20):
    """Pick (btile, block_size): few large blocks (~8 per sequence sweep),
    shrinking the batch tile until double-buffered K+V fit the VMEM budget.

    Accounts for Mosaic tile padding: the lane (minor) dim pads to 128 and
    the sublane dim to 8/itemsize granularity — a [*, bs, Hkv=12, D=64]
    bf16 block really occupies [*, bs, 16, 128] of VMEM."""
    bs = 1
    for cand in (max(64, Smax // 8), 512, 256, 128, 64, 32, 16, 8):
        if cand <= Smax and Smax % cand == 0:
            bs = cand
            break
    sub = max(8, 32 // max(itemsize, 1) // 2)  # 16 for bf16/int8, 8 for f32
    def fits(bt, bs_):
        padded = bt * bs_ * _pad(Hkv, sub) * _pad(D, 128) * itemsize
        return 2 * 2 * padded <= vmem_budget
    btile = B
    while btile > 1 and not fits(btile, bs):
        # prefer shrinking the seq block first if it stays >= 64
        if bs > 64 and Smax % (bs // 2) == 0:
            bs //= 2
        else:
            btile = next(d for d in range(btile - 1, 0, -1) if B % d == 0)
    return btile, bs


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def decode_attention(
    q: jax.Array,             # [B, Hq, D] — one decode token per sequence
    k_cache: jax.Array,       # [L, B, Smax, Hkv, D]
    v_cache: jax.Array,
    context_lens: jax.Array,  # [B] int32 (length INCLUDING current token)
    *,
    layer,
    scale: Optional[float] = None,
    k_scales: Optional[jax.Array] = None,  # [L, B, Smax, Hkv] (int8 KV)
    v_scales: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Decode attention over the contiguous cache → [B, Hq, D].

    ``layer`` may be a traced int32 scalar (used inside lax.scan over
    layers)."""
    B, Hq, D = q.shape
    L, _, Smax, Hkv, _ = k_cache.shape
    G = Hq // Hkv
    if scale is None:
        scale = D ** -0.5
    btile, bs = choose_decode_tiles(B, Smax, Hkv, D,
                                    k_cache.dtype.itemsize)
    nb = Smax // bs
    qg = q.reshape(B, Hkv, G, D)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    kv_quant = k_scales is not None
    nbt = B // btile
    ctx32 = context_lens.astype(jnp.int32)
    # Per-tile max context (prefetched scalars: SMEM loads must be scalar).
    tile_max = jnp.max(ctx32.reshape(nbt, btile), axis=1)   # [nbt]

    def kv_index(bi, j, tmax, layer_ref):
        # Clamp beyond-context steps to this tile's last valid block:
        # identical consecutive indices → Pallas skips the redundant DMA.
        last = jnp.maximum(tmax[bi] - 1, 0) // bs
        return (layer_ref[0], bi, jnp.minimum(j, last), 0, 0)

    def sc_index(bi, j, tmax, layer_ref):
        last = jnp.maximum(tmax[bi] - 1, 0) // bs
        return (layer_ref[0], bi, jnp.minimum(j, last), 0)

    in_specs = [
        pl.BlockSpec((btile, 1), lambda bi, j, *_: (bi, 0)),
        pl.BlockSpec((btile, Hkv, G, D), lambda bi, j, *_: (bi, 0, 0, 0)),
        pl.BlockSpec((1, btile, bs, Hkv, D), kv_index),
        pl.BlockSpec((1, btile, bs, Hkv, D), kv_index),
    ]
    operands = [ctx32.reshape(B, 1), qg, k_cache, v_cache]
    if kv_quant:
        in_specs += [pl.BlockSpec((1, btile, bs, Hkv), sc_index),
                     pl.BlockSpec((1, btile, bs, Hkv), sc_index)]
        operands += [k_scales.astype(jnp.float32),
                     v_scales.astype(jnp.float32)]

    out = pl.pallas_call(
        functools.partial(_decode_kernel, block_size=bs, scale=scale,
                          n_blocks=nb, btile=btile, kv_quant=kv_quant),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nbt, nb),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((btile, Hkv, G, D),
                                   lambda bi, j, *_: (bi, 0, 0, 0)),
            scratch_shapes=(
                # G==1 fast path keeps stats in the cache's native layout
                [pltpu.VMEM((btile, 1, Hkv), jnp.float32),
                 pltpu.VMEM((btile, 1, Hkv), jnp.float32),
                 pltpu.VMEM((btile, Hkv, D), jnp.float32)]
                if G == 1 else
                [pltpu.VMEM((btile, Hkv, G, 1), jnp.float32),
                 pltpu.VMEM((btile, Hkv, G, 1), jnp.float32),
                 pltpu.VMEM((btile, Hkv, G, D), jnp.float32)]
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(tile_max, layer_arr, *operands)
    return out.reshape(B, Hq, D)
