"""Tiled decode megakernel: whole-layer-stack decode for models whose
per-layer weights do NOT fit VMEM (7B/70B-class).

The small-model megakernel (ops/decode_layer.py) streams each layer's full
weight set through VMEM via a grid=(num_layers,) pipeline. For a 7B-class
layer (~200 MB int8) that is impossible, so the big-model decode previously
fell back to per-op XLA dispatch: ~15 ops x num_layers per token, each with
~10-15us fixed cost, leaving B=1 decode at ~40% of the weight-streaming
roofline (latency-bound, not bandwidth-bound).

This kernel keeps ONE pallas_call per decode step with grid
``(num_layers, Ka + Km)``:

  * phases 0..Ka-1 — attention, tiled by **query-head group**: each phase
    streams the [h, Hg*D] column slices of Wq/Wk/Wv and the [Hg*D, h] row
    slice of Wo, computes that group's q/k/v (+RoPE, +KV-cache write),
    runs blockwise attention over the cache's lane slice for the group
    (head groups are independent in attention), and accumulates the
    group's out-projection partial sum into a VMEM accumulator.
  * phase Ka — fold: residual += o_acc, compute norm2 into the hidden
    scratch, zero the accumulator (then falls through to the first MLP
    chunk in the same phase).
  * phases Ka..Ka+Km-1 — MLP, tiled by **intermediate chunk**: stream
    [h, ic] slices of W_up/W_gate and the [ic, h] slice of W_down,
    activate, accumulate partial down-projections. The final chunk's
    out-of-range lanes (intermediate % ic != 0) are masked in-kernel, so
    no host-side weight padding is needed.

Sparse-MoE models (Mixtral architecture) run the same schedule with the
MLP phases expanded to ``E * Km`` (expert x chunk) phases: the router is
evaluated IN-KERNEL at the fold phase (softmax -> top-k -> renormalize,
the twin of ops.moe.router_topk) and each expert's streamed contribution
is weighted by its per-token combine weight — tokens not routed to an
expert contribute 0. At decode batch sizes (B x top_k assignments over E
experts) nearly every expert is touched every step, so streaming all
experts masked matches the all-expert-bytes roofline while avoiding the
XLA path's dequant-materialize (int8 read + bf16 write + bf16 read = 3x
bytes — the round-3 moe decode hole).

Weight chunks stream via MANUAL double-buffered DMA through a SHARED
four-buffer scratch pool that the attention and MLP phases reuse (each
phase prefetches the next phase's chunks into the other slot, including
across the attn→MLP and layer boundaries). Compared with giving all seven
weight operands their own pipeline buffers, the pool halves the VMEM
footprint, which lets the chunks — and so the per-token phase count —
roughly double (7B int8: 15 → 6 phases/layer). Each chunk still crosses
HBM exactly once per layer and every DMA flies under the previous phase's
compute; per-(buffer, slot) semaphores keep in-flight prefetches from
satisfying the current phase's waits.

Layout rules follow decode_layer.py: flat [L, B, Smax, Hkv*D] cache, no
lane-splitting reshapes, per-head structure via constant 0/1 matrices on
the MXU, INT8 weights dequantized per-output-channel at each matmul, INT8
KV dequant fused into the score/PV dots. INT8 KV scales ride in a
group-major padded layout [L, B, Ka, 8, Smax] so each phase can DMA its
group's slab with leading-dim (always-legal) slicing.

Capability parity: same surface as ops/decode_layer.py (the reference's
fully-fused attention taken to the whole stack,
/root/reference/kernels/triton/flash_attention_kernels.py:347-684), extended
to arbitrarily large layers.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mlio_tpu.ops.decode_layer import (
    _activate,
    _norm,
    _pad,
    _quantize_heads,
    _rope_consts,
)

NEG_INF = float("-inf")
# pallas_call scoped-VMEM ceiling: near the 128M physical limit so the
# Mosaic register allocator's spill slots (which scoped VMEM must cover, and
# which the tiling budget can't see) have real headroom.
_VMEM_LIMIT = 126 << 20
# chunk-size search budget: deliberately ~26M under the limit — the gap
# absorbs stack/spill (measured ~50M for fp8 dequant at 70B shapes, ~5M for
# int8 at 7B shapes; the fp8 reserve terms below account for the rest).
_VMEM_BUDGET = 100 << 20


class Tiling(NamedTuple):
    hg: int    # q heads per attention phase
    ic: int    # intermediate lanes per MLP phase
    ka: int    # number of attention phases
    km: int    # number of MLP phases
    ws: int = 2  # weight-pool slots (3 = triple-buffered streaming;
    #              dma_bench.py: depth-2 queues drain between wait/refill)


def choose_tiling(spec, B: int, weight_itemsize: int = 1,
                  cache_itemsize: int = 2,
                  vmem_budget: int = _VMEM_BUDGET,
                  weight_fmt: Optional[str] = None,
                  ) -> Optional[Tiling]:
    """Pick (head-group, intermediate-chunk) sizes that fit the VMEM budget.

    Weight chunks stream through a SHARED double-buffered scratch pool via
    manual DMA (attention and MLP phases reuse the same four buffers), so
    the constraint is 2*(per-buffer max over the two phase types) + cache
    buffers + scratch <= budget — roughly HALF the footprint of giving each
    of the seven weight operands its own pipeline buffer, which is what
    lets the MLP chunk (and so the phase count) roughly double.

    ``weight_fmt="fp8"`` additionally reserves stack headroom proportional
    to the chunk sizes: the fp8→bf16 dequant lowers with large live vector
    temporaries (~50M of register-allocator spill at 70B shapes, roughly
    invariant to sub-chunking the cast), so the same budget that works for
    int8 overflows scoped VMEM for fp8.
    """
    h, I = spec.hidden_size, spec.intermediate_size
    Hq, Hkv, D = spec.num_heads, spec.num_kv_heads, spec.head_size
    gated = spec.activation in ("swiglu", "geglu")
    fp8 = weight_fmt == "fp8"
    wi = weight_itemsize

    scratch = 3 * B * _pad(h, 128) * 4 + (2 << 20)  # x_res/h/acc + consts
    best = None
    # static default: ws=2 (chip-measured best at 7B-class chunk sizes;
    # ws=3 is in the TUNER's search space for classes where deeper
    # streaming wins)
    for ws, ka in [(2, k_) for k_ in (1, 2, 4, 8, 16)]:
        if Hq % ka or Hkv % ka:
            # kv heads must split evenly into the same number of groups
            continue
        hg = Hq // ka
        hkvg = Hkv // ka
        if ka > 1 and ((hg * D) % 128 or (hkvg * D) % 128):
            # cache lane slices must be 128-aligned (ka==1 slices full width)
            continue
        Qg, KVg = hg * D, hkvg * D
        cache_bufs = 3 * 2 * B * 128 * KVg * cache_itemsize  # depth-3 k+v
        room = vmem_budget - cache_bufs - scratch
        reserve = 1.5 if fp8 else 1.0  # dequant-cast spill headroom

        def pool_bytes(ic):
            # ALL seven weights share the four ws-slot pool buffers
            # (manual DMA): each buffer is max(attn, mlp) width
            cup = max(Qg, ic)
            cmid = max(KVg, ic) if gated else KVg
            dn = max(Qg, ic)
            pool = ws * h * wi * (cup + cmid + KVg + dn)
            return int(pool * reserve)

        ic = None
        cand_ic = min(_pad(I, 128), 1 << 16)
        while cand_ic >= 128:
            if pool_bytes(cand_ic) <= room:
                ic = cand_ic
                break
            cand_ic -= 128
        if ic is None:
            continue
        km = -(-I // ic)
        if km > 1 and I % 128:
            # clamped-start edge chunks need 128-aligned intermediate
            # slicing; unaligned models must fit in one chunk
            continue
        cand = Tiling(hg=hg, ic=ic, ka=ka, km=km, ws=ws)
        # prefer the fewest total phases among feasible static candidates
        # (the tuner refines chunk size per shape class)
        if best is None or (cand.ka + cand.km) < (best.ka + best.km):
            best = cand
    return best


def resolve_tiling(spec, B: int, weight_itemsize: int = 1,
                   cache_itemsize: int = 2,
                   weight_fmt: Optional[str] = None,
                   cache_len: Optional[int] = None,
                   quant: bool = False) -> Optional[Tiling]:
    """choose_tiling, overridden by a chip-tuned (ka, ic, ws) from the
    autotune table when one exists for this shape class (the tuner sweeps
    tilings; the static heuristic is the fallback). Divisibility is
    re-validated so a stale table entry can never produce an illegal
    tiling."""
    base = choose_tiling(spec, B, weight_itemsize, cache_itemsize,
                         weight_fmt=weight_fmt)
    if base is None or cache_len is None:
        return base
    from mlio_tpu.ops.autotune import lookup_key, tiled_decode_key

    t = lookup_key(tiled_decode_key(spec.hidden_size, spec.kv_dim, B,
                                    cache_len, quant)) or {}
    if "ka" not in t or "ic" not in t:
        return base
    ka, ic, ws = int(t["ka"]), int(t["ic"]), int(t.get("ws", 2))
    Hq, Hkv, D = spec.num_heads, spec.num_kv_heads, spec.head_size
    I = spec.intermediate_size
    km = -(-I // ic)
    if (Hq % ka or Hkv % ka or ic % 128
            or (ka > 1 and (((Hq // ka) * D) % 128
                            or ((Hkv // ka) * D) % 128))
            or (km > 1 and I % 128)):
        return base
    return Tiling(hg=Hq // ka, ic=ic, ka=ka, km=km, ws=ws)


def _weight_itemsize(blocks) -> Optional[int]:
    from mlio_tpu.ops.quant import QTensor

    if blocks is None:
        return 2
    if "wq" not in blocks:  # fused-projection layout unsupported here
        return None
    w = blocks["wq"]
    if isinstance(w, QTensor):
        return 1 if w.fmt in ("int8", "fp8") else None
    return jnp.dtype(w.dtype).itemsize


def _weight_fmt(blocks) -> Optional[str]:
    from mlio_tpu.ops.quant import QTensor

    if blocks is not None and isinstance(blocks.get("wq"), QTensor):
        return blocks["wq"].fmt
    return None


def supports_decode_tiled(spec, B: int = 8, cache_quant: bool = False,
                          blocks=None, smax: Optional[int] = None) -> bool:
    """Whether the tiled megakernel applies to this model/layout.

    Sparse-MoE models qualify too: the MLP phases become (expert x chunk)
    phases with the router evaluated in-kernel at the fold phase — the
    fused MoE decode path (see _tiled_kernel)."""
    if spec.parallel_residual:
        return False
    if cache_quant and smax is not None and smax % 128:
        return False  # scale-slab lane slices need a 128-aligned cache
    if spec.activation not in ("swiglu", "geglu", "gelu", "gelu_new",
                               "gelu_tanh", "relu"):
        return False
    itemsize = _weight_itemsize(blocks)
    if itemsize is None:
        return False
    if spec.num_experts:
        if blocks is None or blocks.get("router") is None:
            return False
        if blocks.get("moe_up") is None or blocks.get("moe_down") is None:
            return False
        from mlio_tpu.ops.quant import QTensor

        # expert weights must share the attention weights' storage dtype
        mu, wq = blocks["moe_up"], blocks["wq"]
        if isinstance(mu, QTensor) != isinstance(wq, QTensor):
            return False
        if isinstance(mu, QTensor) and mu.fmt != wq.fmt:
            return False
    if spec.head_size % 128 and (spec.num_heads * spec.head_size) % 128:
        return False
    return choose_tiling(spec, B, itemsize, 1 if cache_quant else 2,
                         weight_fmt=_weight_fmt(blocks)) is not None


# ---------------------------------------------------------------------------
# Scale-cache layout for the tiled path


def pad_scales_for_tiled(sc: jax.Array, Hkv: int, ka: int) -> jax.Array:
    """Scan-layout scales [L, B, Smax, Hkv] -> group-major padded
    [L, B, Ka, pad8(Hkv/Ka), Smax] (one-time conversion at the prefill
    boundary). Each group's sub-slab is 8-sublane padded so a leading-dim
    DMA slice is always legal."""
    L, B, Smax, _ = sc.shape
    hkvg = Hkv // ka
    sc = sc.transpose(0, 1, 3, 2).reshape(L, B, ka, hkvg, Smax)
    pad = _pad(hkvg, 8) - hkvg
    if pad:
        sc = jnp.pad(sc, ((0, 0),) * 3 + ((0, pad), (0, 0)))
    return sc


def unpad_scales_from_tiled(sc: jax.Array, Hkv: int) -> jax.Array:
    """Inverse of pad_scales_for_tiled -> [L, B, Smax, Hkv]."""
    L, B, ka, _, Smax = sc.shape
    hkvg = Hkv // ka
    return (sc[:, :, :, :hkvg, :].reshape(L, B, Hkv, Smax)
            .transpose(0, 1, 3, 2))


_NAMES = ["x", "cosq", "sinq", "cosk", "sink", "rotq", "rotk",
          "expand", "group", "kvmap",
          "ln1_scale", "ln1_bias", "wq", "sq", "bq", "wk", "sk", "bk",
          "wv", "sv", "bv", "wo", "so", "bo", "ln2_scale", "ln2_bias",
          "router",
          "w_up", "s_up", "b_up", "w_gate", "s_gate", "b_gate",
          "w_down", "s_down", "b_down",
          "k_cache", "v_cache", "ks_cache", "vs_cache"]


# Max bf16 bytes a single dequant-cast intermediate may hold in vregs.
# Casting a whole [K, N] quantized chunk to bf16 materializes K*N*2 bytes
# in registers; at 70B shapes (~25 MB per matmul, several live at once)
# that spills past VMEM. Sub-chunking the contracting dim bounds it.
_CAST_CHUNK_BYTES = 2 << 20


def _qdot(h16, w, out_w):
    """h16 @ w with the int8/fp8→bf16 dequant cast sub-chunked along the
    contracting dim so at most _CAST_CHUNK_BYTES of cast weight is live.
    fp8 storage converts via the integer bit assembly (ops.quant
    fp8_to_bf16 — ~6x the software astype; v5e has no fp8 ALU)."""
    from mlio_tpu.ops.quant import cast_weight

    K = w.shape[0]
    rows = max(512, _CAST_CHUNK_BYTES // (out_w * 2) // 512 * 512)
    if K <= rows or K % rows:
        return jnp.dot(h16, cast_weight(w, h16.dtype),
                       preferred_element_type=jnp.float32)
    y = None
    for j in range(0, K, rows):
        part = jnp.dot(h16[:, j:j + rows],
                       cast_weight(w[j:j + rows], h16.dtype),
                       preferred_element_type=jnp.float32)
        y = part if y is None else y + part
    return y


def _mmc(h16, w_ref, b_ref, s_ref):
    """x @ chunk (+bias, int8 per-channel dequant fused); refs are the
    current phase's weight chunk blocks."""
    return _mmv(h16, w_ref[0], b_ref, s_ref)


def _mmv(h16, w, b_ref, s_ref):
    """x @ chunk on an ARRAY (a shared-pool scratch slice)."""
    if s_ref is not None:
        y = _qdot(h16, w, w.shape[1])
        y = y * s_ref[0].astype(jnp.float32)
    else:
        y = jnp.dot(h16, w, preferred_element_type=jnp.float32)
    if b_ref is not None:
        y = y + b_ref[0].astype(jnp.float32)
    return y


def _mmvv(h16, w, b, sc):
    """x @ chunk on an ARRAY with VALUE bias/scale (sliced per phase from
    per-layer rows inside the kernel)."""
    if sc is not None:
        y = _qdot(h16, w, w.shape[1])
        y = y * sc.astype(jnp.float32)
    else:
        y = jnp.dot(h16, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y


def _tiled_kernel(pos_ref, *refs, flags, B, D, bs, tiling, I_total,
                  norm, eps, activation, scale, gated, grouped,
                  cdtype, kv_quant, hkvg, smax, n_experts=0, top_k=0,
                  kv_depth=2, npw=1):
    """ONE grid step == one whole LAYER; the Ka attention-group and
    (E x) Km MLP-chunk phases run as in-body fori loops over the same
    manually double-buffered weight pool. Round 5 restructure: with phases
    as a second grid dimension the per-grid-step fixed cost measured
    4.3 us/phase x ~256 phases = ~1.1 ms/token on 7B int8 (pipeline
    bookkeeping + output flushes per phase); loop iterations pay none of
    that, and sharing the pool across ALL seven weights (w_up/w_gate no
    longer ride the auto pipeline) SHRINKS the footprint, so feasible
    chunks grow."""
    it = iter(refs)
    r = {n: (next(it) if flags[n] else None) for n in _NAMES}
    x_out, k_new, v_new = next(it), next(it), next(it)
    if kv_quant:
        ks_new, vs_new = next(it), next(it)
    moe = n_experts > 0
    x_res, h_scr, acc_scr = next(it), next(it), next(it)
    comb_scr = next(it) if moe else None
    kb, vb = next(it), next(it)
    if kv_quant:
        ksb, vsb = next(it), next(it)
    wbu, wbm, wbv_, wbd = next(it), next(it), next(it), next(it)
    wsems = next(it)
    sems = next(it)

    layer = pl.program_id(0)
    pos = pos_ref[0, 0]
    Hg, ic, Ka, Km, ws = tiling
    Qg = Hg * D
    KVg = hkvg * D
    hkvp = _pad(hkvg, 8)
    EKm = max(n_experts, 1) * Km
    P = Ka + EKm
    L = pl.num_programs(0)
    base = layer * P               # global phase counter (slot parity)
    single_chunk = Km == 1
    I_true = r["w_up"].shape[2]    # true intermediate width

    # Weight DMAs split into npw ROW-parts so their issue can be staggered
    # through the phase body: the DMA queue services FIFO, so a monolithic
    # next-phase weight fetch issued ahead of this phase's cache blocks
    # stalls the attention scan head-of-line for up to the whole fetch
    # (~40 us/phase measured at 7B). Parts also keep the queue from
    # draining at phase boundaries (the ws=2 depth penalty).
    HH = (r["wq"] if r["wq"] is not None else r["w_up"]).shape[-2]
    hr = HH // npw
    qr = Qg // npw

    def attn_copies(l_, g_, slot_, part=None):
        cps = []
        for p in (range(npw) if part is None else (part,)):
            cps += [
                pltpu.make_async_copy(
                    r["wq"].at[l_, pl.ds(p * hr, hr), pl.ds(g_ * Qg, Qg)],
                    wbu.at[slot_, pl.ds(p * hr, hr), pl.ds(0, Qg)],
                    wsems.at[0, slot_]),
                pltpu.make_async_copy(
                    r["wk"].at[l_, pl.ds(p * hr, hr), pl.ds(g_ * KVg, KVg)],
                    wbm.at[slot_, pl.ds(p * hr, hr), pl.ds(0, KVg)],
                    wsems.at[1, slot_]),
                pltpu.make_async_copy(
                    r["wv"].at[l_, pl.ds(p * hr, hr), pl.ds(g_ * KVg, KVg)],
                    wbv_.at[slot_, pl.ds(p * hr, hr), pl.ds(0, KVg)],
                    wsems.at[2, slot_]),
                pltpu.make_async_copy(
                    r["wo"].at[l_, pl.ds(g_ * Qg + p * qr, qr), :],
                    wbd.at[slot_, pl.ds(p * qr, qr), :], wsems.at[3, slot_]),
            ]
        return cps

    ir = (I_true if single_chunk else ic) // npw

    def mlp_copies(l_, e_, kk_, slot_, part=None):
        # all three MLP weights stream through the pool; the edge chunk
        # uses a CLAMPED start (alignment-safe) and the overlap columns
        # are masked to zero in compute so nothing double-counts
        le = l_ * n_experts + e_ if moe else l_
        wide = I_true if single_chunk else ic
        start_c = (jnp.int32(0) if single_chunk else pl.multiple_of(
            jnp.minimum(kk_ * ic, I_total - ic), 128))
        cps = []
        for p in (range(npw) if part is None else (part,)):
            cps += [pltpu.make_async_copy(
                        r["w_up"].at[le, pl.ds(p * hr, hr),
                                     pl.ds(start_c, wide)],
                        wbu.at[slot_, pl.ds(p * hr, hr), pl.ds(0, wide)],
                        wsems.at[0, slot_]),
                    pltpu.make_async_copy(
                        r["w_down"].at[le, pl.ds(start_c + p * ir, ir), :],
                        wbd.at[slot_, pl.ds(p * ir, ir), :],
                        wsems.at[3, slot_])]
            if r["w_gate"] is not None:
                cps.append(pltpu.make_async_copy(
                    r["w_gate"].at[le, pl.ds(p * hr, hr),
                                   pl.ds(start_c, wide)],
                    wbm.at[slot_, pl.ds(p * hr, hr), pl.ds(0, wide)],
                    wsems.at[1, slot_]))
        return cps

    def start(cps):
        for c in cps:
            c.start()

    def wait(cps):
        for c in cps:
            c.wait()

    def issue_global(gp, part=None):
        """Issue the weight DMAs for GLOBAL phase gp (any layer) into its
        slot — the ws-deep streaming queue is fed ws-1 phases ahead.
        ``part`` issues one row-part (staggered issue); None = all."""
        l_ = gp // P
        ph = gp - l_ * P
        slot_ = lax.rem(gp, ws)

        @pl.when((gp < L * P) & (ph < Ka))
        def _():
            start(attn_copies(l_, ph, slot_, part))

        @pl.when((gp < L * P) & (ph >= Ka))
        def _():
            t_ = ph - Ka
            e_ = t_ // Km if moe else jnp.int32(0)
            start(mlp_copies(l_, e_, t_ - e_ * Km, slot_, part))

    @pl.when(layer == 0)  # seed residual + warm the first ws-1 phases
    def _():
        x_res[...] = r["x"][...].astype(jnp.float32)
        for w0 in range(ws - 1):
            issue_global(jnp.int32(w0))

    # layer entry: zero the accumulator, norm1 into the hidden scratch
    acc_scr[...] = jnp.zeros(acc_scr.shape, acc_scr.dtype)
    h_scr[...] = _norm(x_res[...], r["ln1_scale"], r["ln1_bias"],
                       norm, eps).astype(h_scr.dtype)

    ctx = pos
    nb = (ctx + bs - 1) // bs

    expand = r["expand"][...]                                 # [Hg, Qg] 0/1
    expf = expand.astype(jnp.float32)
    bf = cdtype

    def row(name, start_l, width, e_idx=None):
        ref = r[name]
        if ref is None:
            return None
        # .at[0] first: a single (int, full, dyn-slice) load on the 3D ref
        # trips Mosaic's load-transform limit ("Too many leaves for
        # PyTreeDef") for multi-row (MoE) consts — splitting the indexing
        # into a subref + 2D load lowers everywhere. A PYTHON-int start
        # must stay a static slice: a raw traced scalar (the single-chunk
        # MoE case) hits the same limit where pl.multiple_of-wrapped
        # dynamic starts do not.
        if isinstance(start_l, int):
            sl = ref.at[0][:, start_l:start_l + width]        # [rows, width]
        else:
            sl = ref.at[0][:, pl.ds(start_l, width)]
        if sl.shape[0] > 1:  # per-expert rows (MoE): one-hot select
            er = lax.broadcasted_iota(jnp.int32, sl.shape, 0)
            sl = jnp.sum(jnp.where(er == e_idx, sl, 0.0), axis=0,
                         keepdims=True)
        return sl                                             # [1, width]

    # ---- attention phases: one query-head group per iteration ------------
    def attn_body(g, carry):
        slot = lax.rem(base + g, ws)

        def kv_copies(j, s2):
            kr = pltpu.make_async_copy(
                r["k_cache"].at[layer, :, pl.ds(j * bs, bs),
                                pl.ds(g * KVg, KVg)], kb.at[s2],
                sems.at[s2])
            vr = pltpu.make_async_copy(
                r["v_cache"].at[layer, :, pl.ds(j * bs, bs),
                                pl.ds(g * KVg, KVg)], vb.at[s2],
                sems.at[kv_depth + s2])
            return kr, vr

        # ISSUE ORDER IS THE PHASE'S CRITICAL PATH (measured −0.9 ms/step
        # at 7B): the DMA queue services FIFO, so this phase's cache
        # blocks and scale slabs must enqueue BEFORE the next phase's
        # ~16-32 MB weight fetch — otherwise the block-scan loop stalls
        # head-of-line behind bytes whose deadline is a whole phase away.
        for dd in range(kv_depth):
            if smax >= (dd + 1) * bs:
                @pl.when(nb > dd)
                def _(dd=dd):
                    for c in kv_copies(dd, dd):
                        c.start()

        if kv_quant:
            ksd = pltpu.make_async_copy(r["ks_cache"].at[layer, :, g], ksb,
                                        sems.at[2 * kv_depth])
            vsd = pltpu.make_async_copy(r["vs_cache"].at[layer, :, g], vsb,
                                        sems.at[2 * kv_depth + 1])
            ksd.start()
            vsd.start()

        # part 0 of the next phase's weights now; the rest staggered
        # through the cache-block loop so cache refills keep queue priority
        issue_global(base + g + ws - 1, 0 if npw > 1 else None)

        wait(attn_copies(layer, g, slot))
        h16 = h_scr[...]
        q = _mmvv(h16, wbu[slot, :, :Qg], row("bq", g * Qg, Qg),
                  row("sq", g * Qg, Qg))                      # [B, Qg] f32
        k = _mmvv(h16, wbm[slot, :, :KVg], row("bk", g * KVg, KVg),
                  row("sk", g * KVg, KVg))
        v = _mmvv(h16, wbv_[slot, :, :KVg], row("bv", g * KVg, KVg),
                  row("sv", g * KVg, KVg))
        if r["rotq"] is not None:
            q = (q * r["cosq"][...].astype(jnp.float32)
                 + jnp.dot(q, r["rotq"][...].astype(jnp.float32),
                           preferred_element_type=jnp.float32)
                 * r["sinq"][...].astype(jnp.float32))
            k = (k * r["cosk"][...].astype(jnp.float32)
                 + jnp.dot(k, r["rotk"][...].astype(jnp.float32),
                           preferred_element_type=jnp.float32)
                 * r["sink"][...].astype(jnp.float32))

        if kv_quant:
            kq, ksc, k_dq = _quantize_heads(k, hkvg, D, hkvp)
            vq, vsc, v_dq = _quantize_heads(v, hkvg, D, hkvp)
            k_new[:, :, :, pl.ds(g * KVg, KVg)] = kq[None, :, None, :]
            v_new[:, :, :, pl.ds(g * KVg, KVg)] = vq[None, :, None, :]
            ks_new[:, :, pl.ds(g * hkvp, hkvp), :] = \
                ksc[None, :, :, None].astype(ks_new.dtype)
            vs_new[:, :, pl.ds(g * hkvp, hkvp), :] = \
                vsc[None, :, :, None].astype(vs_new.dtype)
            k, v = k_dq, v_dq
        else:
            k_new[:, :, :, pl.ds(g * KVg, KVg)] = \
                k[None, :, None, :].astype(k_new.dtype)
            v_new[:, :, :, pl.ds(g * KVg, KVg)] = \
                v[None, :, None, :].astype(v_new.dtype)

        qs = q * scale
        qmask = qs[:, :, None] * expand.T[None].astype(jnp.float32)
        if grouped:
            qmask = lax.dot_general(
                qmask, r["group"][...].astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)           # [B, Hg, KVg]
            qmask = qmask.transpose(0, 2, 1)                  # [B, KVg, Hg]
        qmask = qmask.astype(bf)

        m0 = jnp.full((B, 1, Hg), NEG_INF, jnp.float32)
        l0 = jnp.zeros((B, 1, Hg), jnp.float32)
        a0 = jnp.zeros((B, Qg), jnp.float32)

        def pv_select(pv_hk):
            if grouped:
                pv_hk = lax.dot_general(
                    pv_hk, r["group"][...].astype(jnp.float32),
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)       # [B, Hg, Qg]
            return jnp.sum(pv_hk * expf[None], axis=1)        # [B, Qg]

        def to_qheads_t(sc_t):
            return lax.dot_general(sc_t,
                                   r["kvmap"][...].astype(jnp.float32),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

        def softmax_update(sc_, m, l, acc, vals, p_fold=None):
            m_new = jnp.maximum(m, jnp.max(sc_, axis=1, keepdims=True))
            alpha = jnp.where(jnp.isneginf(m), 0.0, jnp.exp(m - m_new))
            p = jnp.exp(sc_ - m_new)
            p = jnp.where(jnp.isneginf(sc_), 0.0, p)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            pv_p = p if p_fold is None else p * p_fold
            pv_hk = lax.dot_general(pv_p.astype(vals.dtype), vals,
                                    (((1,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            alpha_lane = jnp.squeeze(lax.dot_general(
                alpha, expf, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), axis=1)
            acc = acc * alpha_lane + pv_select(pv_hk)
            return m_new, l, acc

        if kv_quant:
            ksd.wait()
            vsd.wait()

        def block(j, carry2):
            m, l, acc = carry2
            s2 = lax.rem(j, kv_depth)
            kr, vr = kv_copies(j, s2)
            kr.wait()
            vr.wait()
            kbv = kb[s2].astype(bf) if kv_quant else kb[s2]
            sc_ = lax.dot_general(kbv, qmask,
                                  (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
            p_fold = None
            if kv_quant:
                sc_ = sc_ * to_qheads_t(ksb[:, :, pl.ds(j * bs, bs)])
                p_fold = to_qheads_t(vsb[:, :, pl.ds(j * bs, bs)])
            col = j * bs + lax.broadcasted_iota(jnp.int32, sc_.shape, 1)
            sc_ = jnp.where(col < ctx, sc_, NEG_INF)
            vals = vb[s2].astype(bf) if kv_quant else vb[s2]
            out = softmax_update(sc_, m, l, acc, vals, p_fold)

            @pl.when(j + kv_depth < nb)
            def _():
                for c in kv_copies(j + kv_depth, s2):
                    c.start()

            # staggered weight-part issue AFTER this iteration's cache
            # refill: weight bytes fill the queue gaps, never the head
            for p_ in range(1, npw):
                @pl.when(j == (nb * p_) // npw)
                def _(p_=p_):
                    issue_global(base + g + ws - 1, p_)
            return out

        m, l, acc = lax.fori_loop(0, nb, block, (m0, l0, a0))

        kf = k.astype(bf)[:, None, :]
        vf = v.astype(bf)[:, None, :]
        s_cur = lax.dot_general(kf, qmask, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        m, l, acc = softmax_update(s_cur, m, l, acc, vf)

        l_lane = jnp.squeeze(lax.dot_general(
            l, expf, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), axis=1)
        l_safe = jnp.where(l_lane == 0.0, 1.0, l_lane)
        attn = (acc / l_safe).astype(cdtype)                  # [B, Qg]

        o = _mmvv(attn, wbd[slot, :Qg, :], None,
                  r["so"][0].astype(jnp.float32) if r["so"] is not None
                  else None)
        acc_scr[...] = acc_scr[...] + o
        return carry

    lax.fori_loop(0, Ka, attn_body, 0)

    # ---- fold attention, norm2 (+ in-kernel router for MoE) ----------------
    x32 = x_res[...] + acc_scr[...]
    if r["bo"] is not None:
        x32 = x32 + r["bo"][0].astype(jnp.float32)
    x_res[...] = x32
    hn16 = _norm(x32, r["ln2_scale"], r["ln2_bias"], norm, eps
                 ).astype(h_scr.dtype)
    h_scr[...] = hn16
    acc_scr[...] = jnp.zeros(acc_scr.shape, acc_scr.dtype)
    if moe:
        wr = r["router"][0].astype(jnp.float32)               # [h, E]
        logits = jnp.dot(hn16.astype(jnp.float32), wr,
                         preferred_element_type=jnp.float32)  # [B, E]
        mx0 = jnp.max(logits, axis=1, keepdims=True)
        pp = jnp.exp(logits - mx0)
        pp = pp / jnp.sum(pp, axis=1, keepdims=True)
        lane = lax.broadcasted_iota(jnp.int32, pp.shape, 1)
        comb = jnp.zeros_like(pp)
        rem_p = pp
        for _ in range(top_k):
            mx = jnp.max(rem_p, axis=1, keepdims=True)
            ismx = rem_p == mx
            first = jnp.min(
                jnp.where(ismx, lane, jnp.int32(2 ** 31 - 1)),
                axis=1, keepdims=True)
            pick = lane == first
            comb = jnp.where(pick, pp, comb)
            rem_p = jnp.where(pick, NEG_INF, rem_p)
        comb_scr[...] = comb / jnp.sum(comb, axis=1, keepdims=True)

    # ---- MLP phases: one (expert,) intermediate chunk per iteration --------
    w_eff = I_true if single_chunk else ic

    def mlp_body(t, carry):
        e_idx = t // Km if moe else jnp.int32(0)
        kk = t - e_idx * Km
        slot = lax.rem(base + Ka + t, ws)
        # MLP phases have no competing cache stream: issue ALL parts up
        # front (staggering here just drains the DMA queue — measured
        # +0.5 ms at short ctx)
        issue_global(base + Ka + t + ws - 1)

        wait(mlp_copies(layer, e_idx, kk, slot))
        h16 = h_scr[...]
        # python 0 (static slice in row()) when single-chunk — see row()
        start_c = (0 if single_chunk
                   else pl.multiple_of(
                       jnp.minimum(kk * ic, I_total - ic), 128))
        bu = row("b_up", start_c, w_eff)
        su = row("s_up", start_c, w_eff, e_idx)
        u = _mmvv(h16, wbu[slot, :, :w_eff], bu, su)          # [B, w_eff]
        # mask columns already covered by the previous chunk (clamped-start
        # overlap) and beyond the true width — they contribute zero
        col = start_c + lax.broadcasted_iota(jnp.int32, u.shape, 1)
        valid = (col >= kk * ic) & (col < I_total)
        u = jnp.where(valid, u, 0.0)
        if gated:
            gt = _mmvv(h16, wbm[slot, :, :w_eff],
                       row("b_gate", start_c, w_eff),
                       row("s_gate", start_c, w_eff, e_idx))
            gt = jnp.where(valid, gt, 0.0)
        else:
            gt = None
        act = _activate(u, gt, activation).astype(cdtype)
        wd = wbd[slot, :w_eff, :]
        H_out = wd.shape[1]
        rows = max(512, _CAST_CHUNK_BYTES // (H_out * 2) // 512 * 512)
        if w_eff <= rows or w_eff % rows:
            spans = [(0, w_eff)]
        else:
            spans = [(j, rows) for j in range(0, w_eff, rows)]
        from mlio_tpu.ops.quant import cast_weight as _cw
        d = None
        for j0, nr in spans:
            wdj = wd[j0:j0 + nr]
            if r["s_down"] is not None:
                wdj = _cw(wdj, cdtype)
            part = jnp.dot(act[:, j0:j0 + nr], wdj,
                           preferred_element_type=jnp.float32)
            d = part if d is None else d + part
        if r["s_down"] is not None:
            sdn = r["s_down"][0]
            if moe:  # [E, H] per-layer block: one-hot select expert row
                erow = lax.broadcasted_iota(jnp.int32, sdn.shape, 0)
                sdn = jnp.sum(jnp.where(erow == e_idx, sdn, 0.0), axis=0,
                              keepdims=True)
            d = d * sdn.astype(jnp.float32)
        if moe:
            lane_e = lax.broadcasted_iota(jnp.int32, (B, n_experts), 1)
            w_e = jnp.sum(jnp.where(lane_e == e_idx, comb_scr[...], 0.0),
                          axis=1, keepdims=True)              # [B, 1]
            d = d * w_e
        acc_scr[...] = acc_scr[...] + d
        return carry

    lax.fori_loop(0, EKm, mlp_body, 0)

    # ---- final fold ---------------------------------------------------------
    x32 = x_res[...] + acc_scr[...]
    if r["b_down"] is not None:
        x32 = x32 + r["b_down"][0].astype(jnp.float32)
    x_res[...] = x32

    @pl.when(layer == pl.num_programs(0) - 1)
    def _():
        x_out[...] = x32.astype(x_out.dtype)


def decode_layer_tiled(
    x: jax.Array,              # [B, H]
    blocks,                    # stacked per-layer params, UNfused layout
    k_cache: jax.Array,        # [L, B, Smax, Hkv*D] flat
    v_cache: jax.Array,
    pos,
    cos: Optional[jax.Array],
    sin: Optional[jax.Array],
    *,
    spec,
    k_scales: Optional[jax.Array] = None,  # [L, B, Ka, 8, Smax] grouped
    v_scales: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    tiling: Optional[Tiling] = None,
    cache_block: Optional[int] = None,
    kv_depth: Optional[int] = None,
    interpret: bool = False,
):
    """One decode step for ALL layers with weight-chunk streaming.

    Same contract as ops.decode_layer.decode_layer_stack but for models
    whose per-layer weights exceed VMEM. INT8 KV scales must arrive in the
    tiled group-major layout (pad_scales_for_tiled).
    Returns (x_out, k_cache, v_cache[, k_scales, v_scales])."""
    from mlio_tpu.ops.quant import QTensor

    B, H = x.shape
    L, _, Smax, KVd = k_cache.shape
    Hq, Hkv, D = spec.num_heads, spec.num_kv_heads, spec.head_size
    kv_quant = k_scales is not None
    cdtype = x.dtype
    if scale is None:
        scale = D ** -0.5
    if tiling is None:
        tiling = choose_tiling(spec, B, _weight_itemsize(blocks) or 2,
                               1 if kv_quant else 2,
                               weight_fmt=_weight_fmt(blocks))
    assert tiling is not None, "no VMEM-feasible tiling for this model"
    Hg, ic, Ka, Km = tiling[:4]
    hkvg = Hkv // Ka
    Qg, KVg = Hg * D, hkvg * D
    G = Hq // Hkv
    gated = spec.activation in ("swiglu", "geglu")
    bs = cache_block or (128 if Smax % 128 == 0 else 64)
    while Smax % bs:
        bs //= 2
    if kv_quant and bs % 128:
        # the in-kernel scale-cache lane slice ksb[:, :, j*bs : j*bs+bs]
        # must be 128-lane aligned (Mosaic cannot slice mid-tile)
        if Smax % 128:
            raise ValueError(
                f"INT8 KV cache needs a 128-aligned cache length "
                f"(cache_len={Smax}); pad the cache to a multiple of 128 "
                f"or use the per-op decode path")
        bs = 128
    if kv_depth is None:
        kv_depth = 3  # dma_bench.py: depth 3 saturates where 2 leaves gaps
    wdtype = cdtype

    def wq_pair(name):
        w = blocks.get(name)
        if isinstance(w, QTensor):
            assert w.fmt in ("int8", "fp8"), \
                "tiled megakernel handles int8/fp8 weight quant only"
            return w.q, w.scale.astype(jnp.float32)[:, None, :]
        return w, None

    # constant head-structure matrices (group-local; identical every group)
    lanes = jnp.arange(Qg)
    expand = (lanes[None, :] // D
              == jnp.arange(Hg)[:, None]).astype(wdtype)      # [Hg, Qg]
    if G > 1:
        kv_lane = jnp.arange(KVg)
        group = ((kv_lane[:, None] // D == (lanes[None, :] // D) // G)
                 & (kv_lane[:, None] % D
                    == lanes[None, :] % D)).astype(wdtype)    # [KVg, Qg]
    else:
        group = None
    kvmap = (jnp.arange(_pad(hkvg, 8))[:, None]
             == jnp.arange(Hg)[None, :] // G).astype(jnp.float32)
    if cos is not None:
        cosq, sinq, rotq = _rope_consts(spec, cos, sin, Hg, wdtype)
        if hkvg != Hg:
            cosk, sink, rotk = _rope_consts(spec, cos, sin, hkvg, wdtype)
        else:
            cosk, sink, rotk = cosq, sinq, rotq
    else:
        cosq = sinq = rotq = cosk = sink = rotk = None

    bp = blocks
    E = spec.num_experts or 0
    moe = E > 0
    wq_, sq_ = wq_pair("wq")
    wk_, sk_ = wq_pair("wk")
    wv_, sv_ = wq_pair("wv")
    wo_, so_ = wq_pair("wo")
    if moe:
        # expert stacks flatten [L, E, ...] -> [L*E, ...] so every chunk
        # index map is a single leading-dim coordinate l*E + e
        def moe_pair(name):
            w = blocks.get(name)
            if w is None:
                return None, None
            if isinstance(w, QTensor):
                assert w.fmt in ("int8", "fp8"), \
                    "tiled megakernel handles int8/fp8 weight quant only"
                q = w.q.reshape((L * E,) + w.q.shape[2:])
                sc = w.scale.astype(jnp.float32).reshape(L * E, -1)
                return q, sc
            return w.reshape((L * E,) + w.shape[2:]), None

        wu_, su_ = moe_pair("moe_up")
        wg_, sg_ = moe_pair("moe_gate") if gated else (None, None)
        wd_, sd_ = moe_pair("moe_down")
        assert all(bp.get(n) is None
                   for n in ("b_up", "b_gate", "b_down")), \
            "expert-MLP biases unsupported in the tiled MoE decode"
    else:
        wu_, su_ = wq_pair("w_up")
        wg_, sg_ = wq_pair("w_gate") if gated else (None, None)
        wd_, sd_ = wq_pair("w_down")
    operands = {
        "x": x,
        "cosq": cosq, "sinq": sinq, "cosk": cosk, "sink": sink,
        "rotq": rotq, "rotk": rotk,
        "expand": expand, "group": group,
        "kvmap": kvmap if kv_quant else None,
        "ln1_scale": bp["ln1_scale"], "ln1_bias": bp["ln1_bias"],
        "wq": wq_, "sq": sq_, "bq": bp["bq"],
        "wk": wk_, "sk": sk_, "bk": bp["bk"],
        "wv": wv_, "sv": sv_, "bv": bp["bv"],
        "wo": wo_, "so": so_, "bo": bp["bo"],
        "ln2_scale": bp["ln2_scale"], "ln2_bias": bp["ln2_bias"],
        "router": bp.get("router") if moe else None,
        "w_up": wu_, "s_up": su_, "b_up": bp["b_up"],
        "w_gate": wg_, "s_gate": sg_,
        "b_gate": bp["b_gate"] if gated else None,
        "w_down": wd_, "s_down": sd_, "b_down": bp["b_down"],
        "k_cache": k_cache, "v_cache": v_cache,
        "ks_cache": k_scales if kv_quant else None,
        "vs_cache": v_scales if kv_quant else None,
    }
    per_layer_vec = {"ln1_scale", "ln1_bias", "sq", "bq", "sk", "bk", "sv",
                     "bv", "so", "bo", "ln2_scale", "ln2_bias", "s_up",
                     "b_up", "s_gate", "b_gate", "s_down", "b_down"}
    for n in per_layer_vec:
        v = operands[n]
        if v is not None and v.ndim == 2:
            operands[n] = v[:, None, :]
    flags = {n: operands[n] is not None for n in _NAMES}

    # Per-layer FULL rows for every bias/scale (the kernel lane-slices its
    # phase's span in-body); all seven big weights + caches stream via
    # MANUAL DMA (memory_space ANY) through the shared pool. MoE scales
    # ride as per-layer [1, E, X] blocks (expert row one-hot selected
    # in-kernel).
    if moe:
        for nm in ("s_up", "s_gate", "s_down"):
            v = operands[nm]
            if v is not None:
                operands[nm] = v.reshape(L, E, -1)
    HBM_STREAMED = {"wq", "wk", "wv", "wo", "w_up", "w_gate", "w_down",
                    "k_cache", "v_cache", "ks_cache", "vs_cache"}
    PER_LAYER_FULL = {"ln1_scale", "ln1_bias", "ln2_scale", "ln2_bias",
                      "sq", "bq", "sk", "bk", "sv", "bv", "so", "bo",
                      "s_up", "b_up", "s_gate", "b_gate", "s_down",
                      "b_down", "router"}

    in_specs = []
    args = []
    for n in _NAMES:
        v = operands[n]
        if v is None:
            continue
        args.append(v)
        if n in HBM_STREAMED:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        elif n in PER_LAYER_FULL:
            in_specs.append(pl.BlockSpec(
                (1,) + v.shape[1:],
                lambda l, *_, _nd=v.ndim: (l,) + (0,) * (_nd - 1)))
        else:  # whole-array constants
            in_specs.append(pl.BlockSpec(
                v.shape, lambda l, *_, _nd=v.ndim: (0,) * _nd))

    out_specs = [
        pl.BlockSpec((B, H), lambda l, *_: (0, 0)),
        pl.BlockSpec((1, B, 1, KVd), lambda l, *_: (l, 0, 0, 0)),
        pl.BlockSpec((1, B, 1, KVd), lambda l, *_: (l, 0, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, H), x.dtype),
        jax.ShapeDtypeStruct((L, B, 1, KVd), k_cache.dtype),
        jax.ShapeDtypeStruct((L, B, 1, KVd), v_cache.dtype),
    ]
    hkvp = _pad(hkvg, 8)
    if kv_quant:
        assert k_scales.shape == (L, B, Ka, hkvp, Smax), (
            "tiled path expects group-major padded scale caches "
            "(pad_scales_for_tiled)")
        out_specs += [pl.BlockSpec((1, B, Ka * hkvp, 1),
                                   lambda l, *_: (l, 0, 0, 0))] * 2
        out_shape += [jax.ShapeDtypeStruct((L, B, Ka * hkvp, 1),
                                           jnp.float32)] * 2

    # weight-DMA row-split factor (staggered issue, see _tiled_kernel):
    # the largest of 4/2/1 whose parts keep every split row dim 8-aligned
    Qg_ = tiling.hg * D
    ic_eff = spec.intermediate_size if tiling.km == 1 else tiling.ic
    npw = next(n for n in (4, 2, 1)
               if H % (8 * n) == 0 and Qg_ % (8 * n) == 0
               and ic_eff % (8 * n) == 0)

    kernel = functools.partial(
        _tiled_kernel, flags=flags, B=B, D=D, bs=bs, tiling=tiling,
        I_total=spec.intermediate_size, norm=spec.norm, eps=spec.norm_eps,
        activation=spec.activation, scale=scale, gated=gated,
        grouped=G > 1, cdtype=cdtype, kv_quant=kv_quant, hkvg=hkvg,
        smax=Smax, n_experts=E, top_k=spec.num_experts_per_tok if moe else 0,
        kv_depth=kv_depth, npw=npw)

    # shared weight pool: 4 double-buffered scratch buffers reused by the
    # attention and MLP phases (all-manual DMA; sharing across ALL seven
    # weights keeps the footprint to max(attn, mlp) widths per buffer)
    wdt = wq_.dtype
    assert all(w is None or w.dtype == wdt
               for w in (wk_, wv_, wo_, wu_, wg_, wd_)), \
        "tiled megakernel expects a uniform weight storage dtype"
    algn = {1: 32, 2: 16, 4: 8}.get(jnp.dtype(wdt).itemsize, 8)
    if tiling.km > 1:
        assert ic % 128 == 0 and spec.intermediate_size % 128 == 0, (
            "multi-chunk MLP needs 128-aligned intermediate slicing "
            "(clamped-start edge chunks)", ic, spec.intermediate_size)
    assert ic % algn == 0, ("intermediate chunk not DMA-sliceable", ic)
    icb = ic if tiling.km > 1 else _pad(spec.intermediate_size, 128)
    cup = max(Qg, icb)            # wq / w_up
    cmid = max(KVg, icb) if gated else KVg            # wk / w_gate
    cdn = max(Qg, icb)            # wo / w_down rows
    pos_spec = pl.BlockSpec((1, 1), lambda l, *_: (0, 0),
                            memory_space=pltpu.SMEM)
    scratch = [
        pltpu.VMEM((B, H), jnp.float32),                      # residual
        pltpu.VMEM((B, H), cdtype),                           # normed hidden
        pltpu.VMEM((B, H), jnp.float32),                      # o/mlp accum
    ]
    if moe:
        scratch.append(pltpu.VMEM((B, E), jnp.float32))       # combine wts
    scratch += [
        pltpu.VMEM((kv_depth, B, bs, KVg), k_cache.dtype),    # k buffers
        pltpu.VMEM((kv_depth, B, bs, KVg), v_cache.dtype),    # v buffers
    ]
    if kv_quant:
        scratch += [pltpu.VMEM((B, hkvp, Smax), jnp.float32)] * 2
    ws = tiling.ws
    scratch += [
        pltpu.VMEM((ws, H, cup), wdt),                        # wq / w_up
        pltpu.VMEM((ws, H, cmid), wdt),                       # wk / w_gate
        pltpu.VMEM((ws, H, KVg), wdt),                        # wv
        pltpu.VMEM((ws, cdn, H), wdt),                        # wo / w_down
        pltpu.SemaphoreType.DMA((4, ws)),                     # (buffer, slot)
    ]
    scratch.append(pltpu.SemaphoreType.DMA(
        (2 * kv_depth + (2 if kv_quant else 0),)))

    outs = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[pos_spec] + in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(jnp.asarray(pos, jnp.int32).reshape(1, 1), *args)
    x_out, k_out, v_out = outs[:3]
    kc = lax.dynamic_update_slice(k_cache, k_out, (0, 0, pos, 0))
    vc = lax.dynamic_update_slice(v_cache, v_out, (0, 0, pos, 0))
    if kv_quant:
        ks_tok = outs[3].reshape(L, B, Ka, hkvp, 1)
        vs_tok = outs[4].reshape(L, B, Ka, hkvp, 1)
        ks = lax.dynamic_update_slice(k_scales, ks_tok, (0, 0, 0, 0, pos))
        vs = lax.dynamic_update_slice(v_scales, vs_tok, (0, 0, 0, 0, pos))
        return x_out, kc, vc, ks, vs
    return x_out, kc, vc
