"""Decode megakernel: the ENTIRE layer stack of one decode step in ONE
pallas_call.

Why: decode on this class of model is op-launch-bound, not bandwidth-bound —
a GPT-2 decode step is ~100 small XLA ops (measured fixed cost ~10-15us per
matmul at [8, 768] GEMV shapes), so the step takes ~1ms while its weight
traffic (~170MB) only justifies ~0.4ms. This kernel runs norm -> QKV ->
RoPE -> KV-cache write -> blockwise attention over the cache -> out-proj ->
norm -> MLP for ALL layers inside a single kernel with grid=(num_layers,):
per-layer weights stream HBM->VMEM through Pallas's pipeline (next layer's
weights prefetch while the current layer computes), the residual lives in a
VMEM scratch across grid steps, and the KV cache is read/written with manual
DMA. One kernel launch replaces ~100.

Layout strategy: Mosaic cannot split the lane (minor) dimension, so there is
no [B, H] -> [B, heads, D] reshape anywhere. Everything stays FLAT
([B, Qd] / [B, KVd] / cache [L, B, Smax, KVd]) and the per-head structure is
expressed with constant matrices on the MXU:
  * scores    s[b,t,h] = ks[b,t] . (q[b] masked to head h)   (masked-Q dot)
  * prob bcast P'[b,t,:] = p[b,t,:] @ EXPAND  (0/1 head->lanes matrix)
  * GQA       ks_full = ks @ GROUP  (0/1 kv-head -> q-head replication)
  * RoPE      rot(x) = x*cosf + (x @ ROT)*sinf (signed permutation matrix)

Capability parity: the fully-fused attention idea of the reference
(_fused_attention_kernel, /root/reference/kernels/triton/
flash_attention_kernels.py:347-684) taken to its TPU-native conclusion —
the reference fuses one attention layer; here the whole decode stack fuses
because the grid dimension IS the layer index.

Quantized serving: INT8 projection weights (QTensor) stream at half the
bytes with per-output-channel dequant fused at each matmul, and the INT8 KV
cache is handled end-to-end — per-(token, head) dequant fuses into the
score/PV dots and the current token is quantized in-kernel (matching
ops.quant.quantize_kv) before the cache write. Scale caches ride transposed
+ sublane-padded ([L, B, pad8(Hkv), Smax]) because a sub-128 minor dim is
not DMA-sliceable.

Constraints: per-layer weights must fit the VMEM budget (true for
GPT-2-class models; larger models fall back to the per-op decode path),
contiguous cache, sequential residual.
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
_VMEM_LIMIT = 100 << 20


def _pad(x: int, m: int) -> int:
    return -(-x // m) * m


def _norm(x32, scale_ref, bias_ref, kind, eps):
    scale = scale_ref[0].astype(jnp.float32)
    if kind == "rmsnorm":
        x32 = x32 * lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
        return x32 * scale
    mu = jnp.mean(x32, -1, keepdims=True)
    xc = x32 - mu
    x32 = xc * lax.rsqrt(jnp.mean(xc * xc, -1, keepdims=True) + eps)
    out = x32 * scale
    if bias_ref is not None:
        out = out + bias_ref[0].astype(jnp.float32)
    return out


def _mm(h16, w_ref, b_ref, s_ref=None):
    """x @ W (+bias). With s_ref, W is INT8 and the per-output-channel
    dequant fuses here: convert the VMEM block to the compute dtype for the
    MXU (weight bytes over HBM stay halved) and scale the f32 result."""
    w = w_ref[0]
    if s_ref is not None:
        w = w.astype(h16.dtype)
    y = jnp.dot(h16, w, preferred_element_type=jnp.float32)
    if s_ref is not None:
        y = y * s_ref[0].astype(jnp.float32)
    if b_ref is not None:
        y = y + b_ref[0].astype(jnp.float32)
    return y


def _activate(u, g, activation):
    if activation == "swiglu":
        return jax.nn.silu(g) * u
    if activation == "geglu":
        return jax.nn.gelu(g, approximate=True) * u
    if activation in ("gelu_new", "gelu_tanh"):
        return jax.nn.gelu(u, approximate=True)
    if activation == "gelu":
        return jax.nn.gelu(u, approximate=False)
    if activation == "relu":
        return jnp.maximum(u, 0.0)
    raise ValueError(f"unknown activation {activation}")


_NAMES = ["x", "cosq", "sinq", "cosk", "sink", "rotq", "rotk",
          "expand", "group", "kvmap",
          "ln1_scale", "ln1_bias", "wq", "sq", "bq", "wk", "sk", "bk",
          "wv", "sv", "bv", "wo", "so", "bo", "ln2_scale", "ln2_bias",
          "w_up", "s_up", "b_up", "w_gate", "s_gate", "b_gate",
          "w_down", "s_down", "b_down",
          "final_scale", "final_bias", "lm_w", "lm_b", "pos_embed",
          "k_cache", "v_cache", "ks_cache", "vs_cache"]


def _quantize_heads(x, Hkv, D, hkv_pad):
    """Per-(row, head) symmetric INT8 on a flat [B, Hkv*D] tensor — the
    in-kernel twin of ops.quant.quantize_kv. Static loop over heads with
    lane slices (no head-dim reshape). Returns (q int8 flat, scale
    [B, hkv_pad] (zero-padded heads for sublane tiling), dequant f32
    flat)."""
    qs, scs, dqs = [], [], []
    for h in range(Hkv):
        sl = x[:, h * D:(h + 1) * D]                          # [B, D] f32
        amax = jnp.max(jnp.abs(sl), axis=1, keepdims=True)
        sc = jnp.where(amax == 0, 1.0, amax / 127.0)
        qh = jnp.clip(jnp.round(sl / sc), -127, 127)
        qs.append(qh)
        scs.append(sc)
        dqs.append(qh * sc)
    if hkv_pad > Hkv:
        scs.append(jnp.zeros((x.shape[0], hkv_pad - Hkv), jnp.float32))
    return (jnp.concatenate(qs, axis=1).astype(jnp.int8),
            jnp.concatenate(scs, axis=1),
            jnp.concatenate(dqs, axis=1))


def _decode_stack_kernel(pos_ref, *refs, flags, B, Hq, D, bs,
                         norm, eps, activation, scale, gated, grouped,
                         cdtype, kv_quant, Hkv, L, greedy=None,
                         combined=False, in_place=False, kv_depth=2,
                         multi=False, embed_scale=None):
    """One grid step == one transformer layer of the decode step.

    With ``greedy`` = (V, Vc, vmajor), grid steps (s, L..) are the fused
    greedy EPILOGUE: final norm once, then one lm_head chunk per step
    streamed through the pipeline with a running (max, argmax) in scratch;
    the last step emits the next token ids directly — no logits ever reach
    HBM.

    With ``multi`` (grid (T, L + chunks)) the WHOLE greedy decode loop runs
    in one kernel: the epilogue additionally captures the argmax token's
    EMBEDDING row as it streams the (tied, vocab-major) lm_head — whenever
    the running max updates, a one-hot [B, Vc] @ chunk [Vc, H] dot refreshes
    an e_tok scratch — and step s+1's layer 0 seeds the residual from e_tok
    instead of a host-side gather. One launch replaces T; the next step's
    layer-0 weights prefetch during the current epilogue, so the per-step
    pipeline ramp disappears along with the dispatch and embedding ops.
    """
    it = iter(refs)
    r = {n: (next(it) if flags[n] else None) for n in _NAMES}
    x_out = next(it)
    if in_place:
        # the cache is an aliased output: the kernel writes the current
        # token's 8-row slab directly (no XLA dynamic_update_slice per step)
        cache_out = next(it)
        k_new = v_new = None
    else:
        cache_out = None
        k_new = next(it)
        v_new = None if combined else next(it)
    if kv_quant:
        ks_new, vs_new = next(it), next(it)
    tok_out = next(it) if greedy else None
    x_res, kb = next(it), next(it)
    vb = None if combined else next(it)
    if kv_quant:
        ksb, vsb = next(it), next(it)
    slab_scr = next(it) if in_place else None
    if greedy:
        hf_scr, m_tok, i_tok = next(it), next(it), next(it)
    e_tok = next(it) if multi else None
    pe_scr = next(it) if flags["pos_embed"] else None
    sems = next(it)

    layer = pl.program_id(1)
    step = pl.program_id(0)
    pos = pos_ref[0, 0] + step

    if greedy:
        V, Vc, vmajor = greedy

        @pl.when(layer >= L)
        def _epilogue():
            ej = layer - L

            @pl.when(layer == L)
            def _():
                hf_scr[...] = _norm(x_res[...], r["final_scale"],
                                    r["final_bias"], norm, eps
                                    ).astype(cdtype)
                m_tok[...] = jnp.full((B, 1), NEG_INF, jnp.float32)
                i_tok[...] = jnp.zeros((B, 1), jnp.int32)

            hf = hf_scr[...]
            w = r["lm_w"][...].astype(hf.dtype)
            if vmajor:  # [Vc, H] rows of a tied [V, H] embedding
                lg = lax.dot_general(hf, w,
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            else:       # [H, Vc] slice of an untied [H, V] head
                lg = jnp.dot(hf, w,
                             preferred_element_type=jnp.float32)
            if r["lm_b"] is not None:
                lg = lg + r["lm_b"][0].astype(jnp.float32)
            # logits softcap is monotonic -> argmax-invariant; skipped.
            col = ej * Vc + lax.broadcasted_iota(jnp.int32, lg.shape, 1)
            lg = jnp.where(col < V, lg, NEG_INF)
            cmax = jnp.max(lg, axis=1, keepdims=True)            # [B, 1]
            carg = jnp.min(jnp.where(lg == cmax, col, jnp.int32(2**31 - 1)),
                           axis=1, keepdims=True)
            upd = cmax > m_tok[...]
            m_tok[...] = jnp.where(upd, cmax, m_tok[...])
            i_tok[...] = jnp.where(upd, carg, i_tok[...])
            if multi:
                # capture the winning token's embedding row from the tied,
                # vocab-major lm chunk as it streams by: rows where the
                # running max updated take onehot(carg) @ chunk
                onehot = (col == carg).astype(hf.dtype)          # [B, Vc]
                emb = jnp.dot(onehot, w,
                              preferred_element_type=jnp.float32)
                e_tok[...] = jnp.where(upd, emb, e_tok[...])

            @pl.when(layer == pl.num_programs(1) - 1)
            def _():
                tok_out[...] = jnp.broadcast_to(
                    i_tok[...], tok_out.shape)


    @pl.when(layer == 0)
    def _():
        if pe_scr is not None:
            # learned positional embedding folded in: one aligned 8-row DMA
            # + a masked-reduction row select (replaces an XLA gather + add
            # per step). The select must NOT be a dynamic sublane slice —
            # Mosaic requires provable 8-alignment of sublane starts, and
            # pos % 8 has none — so pick the row as sum(onehot * slab).
            pos_align = pl.multiple_of((pos // 8) * 8, 8)
            cp = pltpu.make_async_copy(
                r["pos_embed"].at[pl.ds(pos_align, 8), :], pe_scr,
                sems.at[sems.shape[0] - 1])
            cp.start()
            cp.wait()
            slab = pe_scr[...].astype(jnp.float32)            # [8, H]
            rows = lax.broadcasted_iota(jnp.int32, slab.shape, 0)
            row = jnp.sum(jnp.where(rows == pos - pos_align, slab, 0.0),
                          axis=0, keepdims=True)              # [1, H]
        else:
            row = None

        @pl.when(step == 0)
        def _():
            x = r["x"][...].astype(jnp.float32)
            x_res[...] = x if row is None else x + row

        if multi:
            @pl.when(step > 0)
            def _():
                x = e_tok[...]
                if embed_scale is not None:
                    x = x * embed_scale
                x_res[...] = x if row is None else x + row

    @pl.when(layer < L)
    def _layer_body():
        _decode_layer_body(
            r, x_out, k_new, v_new,
            ks_new if kv_quant else None, vs_new if kv_quant else None,
            x_res, kb, vb, ksb if kv_quant else None,
            vsb if kv_quant else None, sems, layer, pos,
            B=B, Hq=Hq, D=D, bs=bs, norm=norm, eps=eps,
            activation=activation, scale=scale, gated=gated,
            grouped=grouped, cdtype=cdtype, kv_quant=kv_quant, Hkv=Hkv,
            L=L, combined=combined, cache_out=cache_out,
            slab_scr=slab_scr, kv_depth=kv_depth)


def _decode_layer_body(r, x_out, k_new, v_new, ks_new, vs_new,
                       x_res, kb, vb, ksb, vsb, sems, layer, pos, *,
                       B, Hq, D, bs, norm, eps, activation, scale, gated,
                       grouped, cdtype, kv_quant, Hkv, L, combined=False,
                       cache_out=None, slab_scr=None, kv_depth=2):
    KVd = Hkv * D
    ctx = pos
    nb = (ctx + bs - 1) // bs

    # kv_depth-deep cache streaming: block j+depth's K/V DMA is issued as
    # block j computes, so the KV read (the dominant per-layer HBM traffic)
    # is never serialized with the score/PV dots. The prewarm DMAs start
    # HERE — before the norm/QKV projections — so their transfer+latency
    # hides under ~20us of projection compute instead of stalling the scan
    # prologue. Depth 3 measures ~765 GB/s vs depth 2's ~650 GB/s at these
    # block sizes (dma_bench.py: double buffering leaves the queue dry
    # between wait and refill; a third slot keeps it saturated). With an
    # INT8 cache the block DMAs are half the bytes and depth 1 (issue
    # in-loop) measured faster than 2 — depth stays a tunable.
    dbuf = kv_depth >= 2

    # In-place mode reads through the ALIASED OUTPUT ref: on TPU it is
    # the same buffer as the input, but interpret mode implements aliasing
    # by buffer handoff, so intra-kernel writes (multi-step decode) are
    # only visible through the output ref.
    kc_src = cache_out if cache_out is not None else r["k_cache"]

    def kv_copies(j, slot):
        if combined:  # k|v share lanes of one buffer: ONE DMA per block
            return (pltpu.make_async_copy(
                kc_src.at[layer, :, pl.ds(j * bs, bs)], kb.at[slot],
                sems.at[slot]),)
        kr = pltpu.make_async_copy(
            r["k_cache"].at[layer, :, pl.ds(j * bs, bs)], kb.at[slot],
            sems.at[slot])
        vr = pltpu.make_async_copy(
            r["v_cache"].at[layer, :, pl.ds(j * bs, bs)], vb.at[slot],
            sems.at[kv_depth + slot])
        return kr, vr

    if dbuf:
        for d in range(kv_depth):
            if r["k_cache"].shape[2] >= (d + 1) * bs:  # block exists
                @pl.when(nb > d)
                def _(d=d):
                    for c in kv_copies(d, d):
                        c.start()

    x32 = x_res[...]
    h16 = _norm(x32, r["ln1_scale"], r["ln1_bias"], norm, eps).astype(cdtype)

    q = _mm(h16, r["wq"], r["bq"], r["sq"])                   # [B, Qd] f32
    k = _mm(h16, r["wk"], r["bk"], r["sk"])                   # [B, KVd]
    v = _mm(h16, r["wv"], r["bv"], r["sv"])
    if r["rotq"] is not None:
        def _cs(ref):
            t = ref[...].astype(jnp.float32)
            # multi-step tables arrive as (1, 1, n) blocks of [T, 1, n]
            return t.reshape(t.shape[-2:])
        cosq = _cs(r["cosq"])
        sinq = _cs(r["sinq"])
        q = q * cosq + jnp.dot(q, r["rotq"][...].astype(jnp.float32),
                               preferred_element_type=jnp.float32) * sinq
        cosk = _cs(r["cosk"])
        sink = _cs(r["sink"])
        k = k * cosk + jnp.dot(k, r["rotk"][...].astype(jnp.float32),
                               preferred_element_type=jnp.float32) * sink

    # ---- cache write. Preferred (in-place) path: the cache is an ALIASED
    # output and the kernel read-modify-writes the 8-row-aligned slab
    # containing position ``pos`` with two tiny DMAs — no per-step XLA
    # dynamic_update_slice (measured 25us/step: a 1-sublane update into the
    # (16,128)-tiled cache RMWs whole tiles). A single-token DMA is not
    # sliceable (sublane alignment), but the 8-row slab IS. The slab read
    # starts here and overlaps the attention block scan (read-read overlap
    # is safe); the write happens after the scan's last block read.
    slab_rd = None
    if cache_out is not None:
        pos_al = pl.multiple_of((pos // 8) * 8, 8)

        # the previous layer's slab WRITE (deferred off its critical path)
        # must finish before its source scratch is overwritten by our read
        @pl.when(layer > 0)
        def _():
            pltpu.make_async_copy(
                slab_scr, cache_out.at[layer - 1, :, pl.ds(pos_al, 8)],
                sems.at[2 * kv_depth + 1]).wait()

        slab_rd = pltpu.make_async_copy(
            kc_src.at[layer, :, pl.ds(pos_al, 8)], slab_scr,
            sems.at[2 * kv_depth])
        slab_rd.start()
    if kv_quant:
        # quantize like the cache stores it and attend with the DEQUANTIZED
        # values so the result matches the scan path bit-for-bit
        hkv_pad = _pad(Hkv, 8)
        kq, ksc, k = _quantize_heads(k, Hkv, D, hkv_pad)
        vq, vsc, v = _quantize_heads(v, Hkv, D, hkv_pad)
        k_new[...] = kq[None, :, None, :]
        v_new[...] = vq[None, :, None, :]
        ks_new[...] = ksc[None, :, :, None].astype(ks_new.dtype)
        vs_new[...] = vsc[None, :, :, None].astype(vs_new.dtype)
    elif cache_out is not None:
        pass  # in-place slab write below, after the block scan
    elif combined:
        # one [L, B, 1, 2*KVd] token emit -> ONE cache update in XLA
        k_new[...] = jnp.concatenate([k, v], axis=-1)[
            None, :, None, :].astype(k_new.dtype)
    else:
        k_new[...] = k[None, :, None, :].astype(k_new.dtype)
        v_new[...] = v[None, :, None, :].astype(v_new.dtype)

    expand = r["expand"][...]                                 # [Hq, Qd] 0/1
    expf = expand.astype(jnp.float32)
    bf = cdtype
    qs = q * scale                                            # [B, Qd] f32
    # Masked-Q for per-head dots: QM[b, d, h] = qs[b, d] * expand[h, d],
    # pre-folded through the GQA replication so score dots contract KVd
    # directly against the cache blocks (no per-block K expansion).
    # (built in f32: bf16 minor-dim insertion is unsupported in Mosaic)
    qmask = qs[:, :, None] * expand.T[None].astype(jnp.float32)
    if grouped:
        # fold through GROUP as ONE unbatched dot_general -> [B, Hq, KVd]
        # (a vmapped per-batch dot lowers to a lane-merging tpu.reshape
        # Mosaic rejects; caught by compile_gate on real TPU)
        qmask = lax.dot_general(
            qmask, r["group"][...].astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    qmask = qmask.astype(bf)            # [B, KVd|Qd, Hq] / grouped [B, Hq, KVd]

    m0 = jnp.full((B, 1, Hq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, 1, Hq), jnp.float32)
    a0 = jnp.zeros((B, Hq * D), jnp.float32)

    def pv_select(pv_hk):
        """[B, Hq, KVd] head-major PV -> flat [B, Qd] (pick each q lane's
        own head row, mapping kv lanes to q lanes through GROUP)."""
        if grouped:
            pv_hk = lax.dot_general(
                pv_hk, r["group"][...].astype(jnp.float32),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [B, Hq, Qd]
        return jnp.sum(pv_hk * expf[None], axis=1)            # [B, Qd]

    def to_qheads_t(sc_t):
        """Head-major scales [B, Hkv, T] -> per-q-head [B, T, Hq] (one
        batched MXU dot; also de-transposes)."""
        return lax.dot_general(sc_t, r["kvmap"][...].astype(jnp.float32),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    def softmax_update(s, m, l, acc, vals, p_fold=None):
        """Online-softmax merge of scores s [B, T, Hq] with values
        vals [B, T, KVd] into (m, l, acc). ``p_fold`` (the per-(token,head)
        V dequant scales mapped to q heads) multiplies p only inside the
        P@V contraction."""
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.where(jnp.isneginf(m), 0.0, jnp.exp(m - m_new))
        p = jnp.exp(s - m_new)
        p = jnp.where(jnp.isneginf(s), 0.0, p)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv_p = p if p_fold is None else p * p_fold
        # PV[b, h, :] = sum_t p[b,t,h] * vals[b,t,:]  (MXU, contract T)
        pv_hk = lax.dot_general(pv_p.astype(vals.dtype), vals,
                                (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        alpha_lane = jnp.squeeze(lax.dot_general(
            alpha, expf, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), axis=1)      # [B, Qd]
        acc = acc * alpha_lane + pv_select(pv_hk)
        return m_new, l, acc

    if kv_quant:
        # Scale caches ride TRANSPOSED [L, B, Hkv, Smax] for the mega path
        # (a [.., Smax, Hkv] layout has a sub-128 minor dim, which Mosaic
        # cannot DMA-slice); the whole layer slab is tiny, fetch it once.
        ksd = pltpu.make_async_copy(r["ks_cache"].at[layer], ksb,
                                    sems.at[2 * kv_depth])
        vsd = pltpu.make_async_copy(r["vs_cache"].at[layer], vsb,
                                    sems.at[2 * kv_depth + 1])
        ksd.start()
        vsd.start()
        ksd.wait()
        vsd.wait()

    def block(j, carry):
        m, l, acc = carry
        if dbuf:
            slot = lax.rem(j, kv_depth)
            for c in kv_copies(j, slot):
                c.wait()
        else:
            slot = 0
            cps = kv_copies(j, 0)
            for c in cps:
                c.start()
            for c in cps:
                c.wait()
        if combined:
            buf = kb[slot]
            kbv = buf[:, :, :KVd]
            vals = buf[:, :, KVd:]
        else:
            kbv = kb[slot].astype(bf) if kv_quant else kb[slot]
            vals = vb[slot].astype(bf) if kv_quant else vb[slot]
        s = lax.dot_general(kbv, qmask,
                            (((2,), (2 if grouped else 1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
        p_fold = None
        if kv_quant:
            ksc = ksb[:, :, pl.ds(j * bs, bs)]               # [B, Hkv, bs]
            vsc = vsb[:, :, pl.ds(j * bs, bs)]
            s = s * to_qheads_t(ksc)      # fused K dequant (post-dot)
            p_fold = to_qheads_t(vsc)     # fused V dequant (into P@V)
        col = j * bs + lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < ctx, s, NEG_INF)                  # [B, bs, Hq]
        out = softmax_update(s, m, l, acc, vals, p_fold)
        if dbuf:
            # refill the slot just consumed — after the score/PV dots have
            # read it (in-order vector issue makes the overwrite safe)
            @pl.when(j + kv_depth < nb)
            def _():
                for c in kv_copies(j + kv_depth, slot):
                    c.start()
        return out

    m, l, acc = lax.fori_loop(0, nb, block, (m0, l0, a0))

    # current token's contribution, straight from VMEM (k/v already hold the
    # dequantized values in the kv_quant case)
    kf = k.astype(bf)[:, None, :]                             # [B, 1, KVd]
    vf = v.astype(bf)[:, None, :]
    s_cur = lax.dot_general(kf, qmask,
                            (((2,), (2 if grouped else 1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    m, l, acc = softmax_update(s_cur, m, l, acc, vf)

    if cache_out is not None:
        # all block-scan reads of the overlap tile are done: fold the
        # current token into the slab and write it back (2 x 98KB DMAs vs a
        # 25us XLA dynamic_update_slice)
        slab_rd.wait()
        W = slab_scr.shape[-1]
        cur = (jnp.concatenate([k, v], axis=-1) if combined else k)[:, None]
        rows = lax.broadcasted_iota(jnp.int32, (B, 8, W), 1)
        slab_new = jnp.where(rows == pos - pos_al, cur,
                             slab_scr[...].astype(jnp.float32))
        slab_scr[...] = slab_new.astype(slab_scr.dtype)
        slab_wr = pltpu.make_async_copy(
            slab_scr, cache_out.at[layer, :, pl.ds(pos_al, 8)],
            sems.at[2 * kv_depth + 1])
        slab_wr.start()

        # deferred: layers 0..L-2 are awaited by the NEXT layer's read
        # guard; only the last layer's write sits on the critical path
        @pl.when(layer == L - 1)
        def _():
            slab_wr.wait()

    l_lane = jnp.squeeze(lax.dot_general(
        l, expf, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32), axis=1)          # [B, Qd]
    l_safe = jnp.where(l_lane == 0.0, 1.0, l_lane)
    attn = acc / l_safe                                       # [B, Qd]

    o = _mm(attn.astype(cdtype), r["wo"], r["bo"], r["so"])
    x32 = x32 + o

    h2 = _norm(x32, r["ln2_scale"], r["ln2_bias"], norm, eps).astype(
        h16.dtype)
    u = _mm(h2, r["w_up"], r["b_up"], r["s_up"])
    g = _mm(h2, r["w_gate"], r["b_gate"], r["s_gate"]) if gated else None
    act = _activate(u, g, activation).astype(h16.dtype)
    d = _mm(act, r["w_down"], r["b_down"], r["s_down"])
    x32 = x32 + d
    x_res[...] = x32

    @pl.when(layer == L - 1)
    def _():
        x_out[...] = x32.astype(x_out.dtype)


def decode_vmem_bytes(spec, B: int, bs: int, weight_itemsize: int = 2,
                      cache_itemsize: int = 2, lm_chunk: int = 0) -> int:
    """Double-buffered per-layer weight bytes + attention scratch.
    ``lm_chunk`` > 0 adds the fused greedy epilogue's double-buffered
    lm_head chunk."""
    h, i = spec.hidden_size, spec.intermediate_size
    gated = spec.activation in ("swiglu", "geglu")
    per_layer = (h * spec.q_dim + 2 * h * spec.kv_dim + spec.q_dim * h
                 + (3 if gated else 2) * h * i) * weight_itemsize
    attn = 6 * B * bs * _pad(spec.kv_dim, 128) * cache_itemsize  # depth-3 k+v
    # fp32 block temps: ks/vs/pexp/vfull at [B, bs, Qd]
    temps = 4 * B * bs * _pad(spec.q_dim, 128) * 4
    x_scr = B * _pad(h, 128) * 4
    consts = (spec.num_heads * spec.q_dim * 2
              + 2 * spec.q_dim * spec.q_dim * 2)
    lm = 2 * lm_chunk * _pad(h, 128) * 2 if lm_chunk else 0
    return 2 * per_layer + attn + temps + x_scr + consts + lm


def _weight_itemsize(blocks) -> Optional[int]:
    """1 for int8 QTensor weights, 2 for bf16/f16, 4 for f32; None if the
    weights are in a layout the megakernel does not handle (non-int8 quant,
    or fused wqkv/w_upgate projections)."""
    from mlio_tpu.ops.quant import QTensor

    if blocks is None:
        return 2
    if "wq" not in blocks:  # fused-projection layout -> scan path
        return None
    w = blocks["wq"]
    if isinstance(w, QTensor):
        return 1 if w.fmt == "int8" else None
    return jnp.dtype(w.dtype).itemsize


def supports_decode_stack(spec, cache_quant: bool = False,
                          blocks=None, smax: Optional[int] = None) -> bool:
    """Whether the megakernel path applies (VMEM + feature constraints).
    ``cache_quant`` = INT8 KV cache (supported; halves cache block bytes)."""
    if spec.parallel_residual or spec.num_experts:
        return False
    if cache_quant and smax is not None and smax % 128:
        return False  # scale-slab lane slices need a 128-aligned cache
    if spec.activation not in ("swiglu", "geglu", "gelu", "gelu_new",
                               "gelu_tanh", "relu"):
        return False
    itemsize = _weight_itemsize(blocks)
    if itemsize is None:
        return False
    return (decode_vmem_bytes(spec, 8, 128, itemsize,
                              cache_itemsize=1 if cache_quant else 2)
            < (_VMEM_LIMIT - (12 << 20)))


def _rope_consts(spec, cos, sin, heads, dtype):
    """Flat-layout RoPE: per-lane cos/sin [N, heads*D] (N = positions,
    usually 1; > 1 for the multi-step in-kernel decode) and the signed
    rotate-half permutation ROT [heads*D, heads*D] (x@ROT == rotate_half)."""
    D = spec.head_size
    rot = spec.rope_dim
    half = rot // 2
    n = heads * D
    N = cos.shape[0]
    cpad = jnp.concatenate(
        [cos, jnp.ones((N, D - rot), cos.dtype)], axis=1) if D > rot else cos
    spad = jnp.concatenate(
        [sin, jnp.zeros((N, D - rot), sin.dtype)], axis=1) if D > rot else sin
    cosf = jnp.tile(cpad, (1, heads)).astype(dtype)
    sinf = jnp.tile(spad, (1, heads)).astype(dtype)
    din = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    dout = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    same = (din // D) == (dout // D)
    i_in, i_out = din % D, dout % D
    neg = same & (i_out < half) & (i_in == i_out + half)
    pos_ = same & (i_out >= half) & (i_out < rot) & (i_in == i_out - half)
    rotm = jnp.where(neg, -1.0, jnp.where(pos_, 1.0, 0.0)).astype(dtype)
    return cosf, sinf, rotm


def pad_lm_head_for_mega(lm_head: jax.Array, lm_vmajor: bool = True,
                         vocab_chunk: int = 4096):
    """Pre-pad the lm_head's vocab dim to the epilogue's chunk multiple
    (done ONCE at the prefill/decode boundary — an O(V*H) copy that must
    not land inside the decode scan). Returns (padded, true_vocab, Vc)."""
    V = lm_head.shape[0] if lm_vmajor else lm_head.shape[1]
    Vc = min(vocab_chunk, _pad(V, 128))
    Vpad = -(-V // Vc) * Vc
    if Vpad != V:
        pw = ((0, Vpad - V), (0, 0)) if lm_vmajor else ((0, 0), (0, Vpad - V))
        lm_head = jnp.pad(lm_head, pw)
    return lm_head, V, Vc


def pad_scales_for_mega(sc: jax.Array, Hkv: int) -> jax.Array:
    """[L, B, Smax, Hkv] scan-layout scales -> the mega path's transposed,
    sublane-padded [L, B, pad8(Hkv), Smax] layout (done ONCE at the
    prefill/decode boundary)."""
    sc = sc.transpose(0, 1, 3, 2)
    pad = _pad(Hkv, 8) - Hkv
    if pad:
        sc = jnp.pad(sc, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return sc


def unpad_scales_from_mega(sc: jax.Array, Hkv: int) -> jax.Array:
    """Inverse of pad_scales_for_mega."""
    return sc[:, :, :Hkv, :].transpose(0, 1, 3, 2)


def decode_layer_stack(
    x: jax.Array,              # [B, H] current-token hidden states
    blocks,                    # stacked per-layer params (transformer layout)
    k_cache: jax.Array,        # [L, B, Smax, Hkv*D] — FLAT head layout
    v_cache: jax.Array,
    pos,                       # int32 scalar: write position (ctx = pos+1)
    cos: Optional[jax.Array],  # [1, rope_dim] or None
    sin: Optional[jax.Array],
    *,
    spec,
    k_scales: Optional[jax.Array] = None,  # [L, B, Hkv, Smax] TRANSPOSED
    v_scales: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    interpret: bool = False,
    head_norm=None,                 # (final_scale[H], final_bias[H]|None)
    lm_head: Optional[jax.Array] = None,   # [V, H] (tied) or [H, V]
    lm_head_bias: Optional[jax.Array] = None,
    lm_vmajor: bool = True,
    vocab_chunk: Optional[int] = None,
    vocab_size: Optional[int] = None,      # true V if lm_head is pre-padded
    cache_block: Optional[int] = None,     # KV scan block (tokens/DMA)
    pos_embed: Optional[jax.Array] = None,  # [Smax_pos, H] learned positions
    kv_combined: bool = False,             # k|v packed on lanes of k_cache
    kv_depth: Optional[int] = None,        # KV stream buffer depth (None=auto)
    steps: int = 1,                        # decode steps IN-KERNEL (greedy)
):
    """Run all layers of one decode step in a single Pallas kernel.

    The cache must be FLAT [L, B, Smax, Hkv*D]: on TPU the 5D
    [..., Hkv, D] and flat [..., Hkv*D] layouts are physically different
    tilings, so a reshape here would relayout-copy the whole cache every
    step — the caller flattens ONCE at the prefill/decode boundary instead
    (runtime/generate.py).

    With ``k_scales``/``v_scales`` the cache is INT8 per-(token, head)
    quantized: dequant fuses into the score/PV dots and the current token's
    K/V are quantized in-kernel before the write (exactly matching
    ops.quant.quantize_kv so the scan path agrees bit-for-bit).

    With ``lm_head`` (+``head_norm``) the GREEDY EPILOGUE fuses in: the grid
    grows by ceil(V/vocab_chunk) steps that stream lm_head chunks through
    the same pipeline and keep a running (max, argmax) in scratch, emitting
    next-token ids [B, 128] (id broadcast across lanes) as a final output —
    final norm, the [B,H]x[H,V] logits matmul, and argmax never become XLA
    ops and the logits never touch HBM. ``lm_vmajor`` says whether lm_head
    is vocab-major [V, H] (a tied embedding used as-is, no transpose copy)
    or hidden-major [H, V]. Softcap is argmax-invariant (monotonic) and
    needs no handling.

    With ``steps`` > 1 the whole greedy decode loop runs in ONE launch
    (grid (steps, L + chunks)): requires the fused epilogue with a TIED
    vocab-major lm_head (the epilogue captures the winning token's
    embedding row as the chunks stream by) and the in-place combined
    cache. ``tok`` is then [steps, B]. RoPE models must pass cos/sin as
    per-step tables [steps, rope_dim].

    Returns (x_out, k_cache, v_cache[, k_scales, v_scales][, tok])."""
    B, H = x.shape
    L, _, Smax, KVd = k_cache.shape
    Hq = spec.num_heads
    Hkv = spec.num_kv_heads
    D = spec.head_size
    Qd = Hq * D
    if kv_combined:
        assert v_cache is None and KVd == 2 * Hkv * D, \
            "combined cache packs k|v on the last axis of k_cache"
        KVd = Hkv * D
        assert not (k_scales is not None), \
            "kv_combined currently supports the bf16 cache only"
    else:
        assert KVd == Hkv * D, "decode_layer_stack expects a flat cache"
    G = Hq // Hkv
    if scale is None:
        scale = D ** -0.5
    # KV scan block: smaller blocks waste fewer masked tokens past ctx in
    # the last block but issue more DMAs — a measured tradeoff, so it is a
    # tunable (autotune kind "mega_decode").
    bs = cache_block or (128 if Smax % 128 == 0 else 64)
    while Smax % bs:
        bs //= 2
    if k_scales is not None and bs % 128:
        # the in-kernel scale-slab lane slice ksb[:, :, j*bs : j*bs+bs]
        # must be 128-lane aligned (Mosaic cannot slice mid-tile)
        if Smax % 128:
            raise ValueError(
                f"INT8 KV cache needs a 128-aligned cache length "
                f"(cache_len={Smax}); pad the cache to a multiple of 128 "
                f"or use the per-op decode path")
        bs = 128
    gated = spec.activation in ("swiglu", "geglu")
    kv_quant = k_scales is not None
    # KV stream depth: 3-deep buffering measures ~765 GB/s vs double
    # buffering's ~650 at these block sizes (dma_bench.py); int8 caches
    # measured fastest single-buffered (half the bytes, in-loop issue).
    if kv_depth is None:
        kv_depth = 1 if kv_quant else 3
    cdtype = x.dtype  # compute dtype (weights may be int8 QTensors)
    wdtype = cdtype

    from mlio_tpu.ops.quant import QTensor

    def wq_pair(name):
        """(payload, scale[L,1,N] or None) for a maybe-quantized weight."""
        w = blocks.get(name)
        if isinstance(w, QTensor):
            assert w.fmt == "int8", \
                "decode megakernel handles int8 weight quant only"
            return w.q, w.scale.astype(jnp.float32)[:, None, :]
        return w, None

    kc = k_cache
    vc = v_cache

    # constant head-structure matrices
    lanes = jnp.arange(Qd)
    expand = (lanes[None, :] // D
              == jnp.arange(Hq)[:, None]).astype(wdtype)      # [Hq, Qd]
    if G > 1:
        kv_lane = jnp.arange(KVd)
        group = ((kv_lane[:, None] // D == (lanes[None, :] // D) // G)
                 & (kv_lane[:, None] % D
                    == lanes[None, :] % D)).astype(wdtype)    # [KVd, Qd]
    else:
        group = None
    # padded to sublane granularity; pad rows match no q head -> zeros
    kvmap = (jnp.arange(_pad(Hkv, 8))[:, None]
             == jnp.arange(Hq)[None, :] // G).astype(jnp.float32)
    if cos is not None:
        cosq, sinq, rotq = _rope_consts(spec, cos, sin, Hq, wdtype)
        if Hkv != Hq:
            cosk, sink, rotk = _rope_consts(spec, cos, sin, Hkv, wdtype)
        else:
            cosk, sink, rotk = cosq, sinq, rotq
    else:
        cosq = sinq = rotq = cosk = sink = rotk = None

    # --- fused greedy epilogue setup ---
    greedy = None
    fin_scale = fin_bias = lm_w = lm_b = None
    n_chunks = 0
    if lm_head is not None:
        assert head_norm is not None, "fused epilogue needs the final norm"
        V = vocab_size or (lm_head.shape[0] if lm_vmajor
                           else lm_head.shape[1])
        Vstore = lm_head.shape[0] if lm_vmajor else lm_head.shape[1]
        Vc = vocab_chunk or min(4096, _pad(V, 128))
        n_chunks = -(-V // Vc)
        Vpad = n_chunks * Vc
        lm_w = lm_head
        if Vpad != Vstore:  # zero-pad the chunked dim (cols >= V masked);
            # callers on a hot loop pre-pad via pad_lm_head_for_mega so this
            # pad (an O(V*H) copy) never lands inside a scan body
            pw = ((0, Vpad - Vstore), (0, 0)) if lm_vmajor else \
                ((0, 0), (0, Vpad - Vstore))
            lm_w = jnp.pad(lm_w, pw)
        fin_scale = head_norm[0][None, :]
        fin_bias = (head_norm[1][None, :]
                    if head_norm[1] is not None else None)
        if lm_head_bias is not None:
            lm_b = jnp.pad(lm_head_bias, (0, Vpad - lm_head_bias.shape[0])
                           )[None, :]
        greedy = (V, Vc, lm_vmajor)

    bp = blocks
    wq_, sq_ = wq_pair("wq")
    wk_, sk_ = wq_pair("wk")
    wv_, sv_ = wq_pair("wv")
    wo_, so_ = wq_pair("wo")
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
        "w_up": wu_, "s_up": su_, "b_up": bp["b_up"],
        "w_gate": wg_, "s_gate": sg_,
        "b_gate": bp["b_gate"] if gated else None,
        "w_down": wd_, "s_down": sd_, "b_down": bp["b_down"],
        "final_scale": fin_scale, "final_bias": fin_bias,
        "lm_w": lm_w, "lm_b": lm_b, "pos_embed": pos_embed,
        "k_cache": kc, "v_cache": vc,
        "ks_cache": k_scales if kv_quant else None,
        "vs_cache": v_scales if kv_quant else None,
    }
    _PER_LAYER = {"ln1_scale", "ln1_bias", "wq", "sq", "bq", "wk", "sk",
                  "bk", "wv", "sv", "bv", "wo", "so", "bo", "ln2_scale",
                  "ln2_bias", "w_up", "s_up", "b_up", "w_gate", "s_gate",
                  "b_gate", "w_down", "s_down", "b_down"}
    # [L, X] per-layer vectors -> [L, 1, X] so the (1, 1, X) block satisfies
    # Mosaic's last-two-dims rule (block == full array dims on those axes).
    for n in _PER_LAYER:
        v = operands[n]
        if v is not None and v.ndim == 2:
            operands[n] = v[:, None, :]
    flags = {n: operands[n] is not None for n in _NAMES}

    # Per-layer / per-token-write indices clamp to L-1 during epilogue grid
    # steps (identical consecutive indices skip the refetch/rewrite).
    lclamp = (lambda l: jnp.minimum(l, L - 1)) if greedy else (lambda l: l)

    multi = steps > 1
    if multi:
        assert greedy is not None and lm_vmajor, \
            "multi-step decode needs the fused greedy epilogue with a " \
            "tied vocab-major lm_head (it captures the embedding row)"
        assert kv_combined and not kv_quant, \
            "multi-step decode needs the in-place combined cache"
        if cos is not None:
            assert cos.shape[0] == steps, \
                "multi-step RoPE needs per-step cos/sin [steps, rope_dim]"

    in_specs = []
    args = []
    flat_idx = {}
    idx = 1  # slot 0 is the scalar-prefetch pos
    for n in _NAMES:
        v = operands[n]
        if v is None:
            continue
        flat_idx[n] = idx
        idx += 1
        args.append(v)
        if n in ("k_cache", "v_cache", "ks_cache", "vs_cache",
                 "pos_embed"):
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        elif n == "lm_w":
            if lm_vmajor:
                in_specs.append(pl.BlockSpec(
                    (Vc, v.shape[1]),
                    lambda s, l, *_: (jnp.maximum(l - L, 0), 0)))
            else:
                in_specs.append(pl.BlockSpec(
                    (v.shape[0], Vc),
                    lambda s, l, *_: (0, jnp.maximum(l - L, 0))))
        elif n == "lm_b":
            in_specs.append(pl.BlockSpec(
                (1, Vc), lambda s, l, *_: (0, jnp.maximum(l - L, 0))))
        elif n in _PER_LAYER:
            shape = v.shape
            in_specs.append(pl.BlockSpec(
                (1,) + shape[1:],
                lambda s, l, *_, _nd=v.ndim: (lclamp(l),)
                + (0,) * (_nd - 1)))
        elif multi and n in ("cosq", "sinq", "cosk", "sink"):
            # per-step RoPE rows stream with the step grid dim. A [T, n]
            # layout would need an illegal (1, n) block (sublane dim 1 !=
            # T); as [T, 1, n] the block (1, 1, n) EQUALS the array on the
            # last two dims, which Mosaic accepts.
            args[-1] = v = v[:, None, :]
            in_specs.append(pl.BlockSpec(
                (1, 1, v.shape[2]), lambda s, l, *_: (s, 0, 0)))
        else:  # whole-array constants, fetched once
            in_specs.append(pl.BlockSpec(
                v.shape, lambda s, l, *_, _nd=v.ndim: (0,) * _nd))

    # In-place cache update: combined bf16 caches alias input->output and
    # the kernel slab-writes the current token itself (no XLA DUS per step).
    in_place = kv_combined and not kv_quant
    kv_out_w = 2 * KVd if kv_combined else KVd
    out_specs = [pl.BlockSpec(x.shape, lambda s, l, *_: (0, 0))]
    out_shape = [jax.ShapeDtypeStruct((B, H), x.dtype)]
    if in_place:
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(jax.ShapeDtypeStruct(kc.shape, kc.dtype))
    else:
        out_specs.append(pl.BlockSpec(
            (1, B, 1, kv_out_w), lambda s, l, *_: (lclamp(l), 0, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((L, B, 1, kv_out_w), kc.dtype))
    if not kv_combined:
        out_specs.append(pl.BlockSpec(
            (1, B, 1, KVd), lambda s, l, *_: (lclamp(l), 0, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((L, B, 1, KVd), vc.dtype))
    if kv_quant:
        hkv_pad = _pad(Hkv, 8)
        assert k_scales.shape == (L, B, hkv_pad, Smax), (
            "mega path expects transposed, sublane-padded scale caches "
            "(use pad_scales_for_mega)")
        out_specs += [pl.BlockSpec(
            (1, B, hkv_pad, 1),
            lambda s, l, *_: (lclamp(l), 0, 0, 0))] * 2
        out_shape += [jax.ShapeDtypeStruct((L, B, hkv_pad, 1),
                                           jnp.float32)] * 2
    if greedy:
        if multi:
            out_specs.append(pl.BlockSpec((1, B, 128),
                                          lambda s, l, *_: (s, 0, 0)))
            out_shape.append(jax.ShapeDtypeStruct((steps, B, 128),
                                                  jnp.int32))
        else:
            out_specs.append(pl.BlockSpec((B, 128),
                                          lambda s, l, *_: (0, 0)))
            out_shape.append(jax.ShapeDtypeStruct((B, 128), jnp.int32))
    out_specs = tuple(out_specs)
    out_shape = tuple(out_shape)

    kernel = functools.partial(
        _decode_stack_kernel, flags=flags, B=B, Hq=Hq, D=D, bs=bs,
        norm=spec.norm, eps=spec.norm_eps, activation=spec.activation,
        scale=scale, gated=gated, grouped=G > 1, cdtype=cdtype,
        kv_quant=kv_quant, Hkv=Hkv, L=L, greedy=greedy,
        combined=kv_combined, in_place=in_place, kv_depth=kv_depth,
        multi=multi, embed_scale=spec.embed_scale)

    # pos rides in SMEM as a (1,1) operand — scalar PREFETCH measurably
    # halves pipeline throughput here and no index map needs pos, so a
    # plain grid + SMEM scalar is the right shape.
    pos_spec = pl.BlockSpec((1, 1), lambda s, l, *_: (0, 0),
                            memory_space=pltpu.SMEM)
    nbuf = max(kv_depth, 1)
    scratch = [pltpu.VMEM((B, H), jnp.float32)]               # residual
    if kv_combined:
        scratch.append(pltpu.VMEM((nbuf, B, bs, 2 * KVd), kc.dtype))
    else:
        scratch += [pltpu.VMEM((nbuf, B, bs, KVd), kc.dtype),  # k buffers
                    pltpu.VMEM((nbuf, B, bs, KVd), vc.dtype)]  # v buffers
    if kv_quant:
        scratch += [pltpu.VMEM((B, _pad(Hkv, 8), Smax), jnp.float32)] * 2
    if in_place:
        scratch.append(pltpu.VMEM((B, 8, 2 * KVd), kc.dtype))  # cache slab
    if greedy:
        scratch += [pltpu.VMEM((B, H), cdtype),          # final-norm hidden
                    pltpu.VMEM((B, 1), jnp.float32),     # running max
                    pltpu.VMEM((B, 1), jnp.int32)]       # running argmax
    if multi:
        scratch.append(pltpu.VMEM((B, H), jnp.float32))  # next-token embed
    if pos_embed is not None:
        scratch.append(pltpu.VMEM((8, H), pos_embed.dtype))  # pe slab
    n_sems = (2 * max(kv_depth, 2) + (2 if kv_quant else 0)
              + (2 if in_place else 0)
              + (1 if pos_embed is not None else 0))
    scratch.append(pltpu.SemaphoreType.DMA((n_sems,)))

    outs = pl.pallas_call(
        kernel,
        grid=(steps, L + n_chunks),
        in_specs=[pos_spec] + in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        out_shape=out_shape,
        input_output_aliases=({flat_idx["k_cache"]: 1} if in_place else {}),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(jnp.asarray(pos, jnp.int32).reshape(1, 1), *args)
    # non-in-place paths: one token write per STEP (all layers at once) —
    # outside the kernel because a 1-sublane DMA into the tiled cache is
    # not expressible inside (int8 scale caches have a sub-128 minor dim,
    # so the quantized path keeps the XLA update)
    tok = (outs[-1],) if greedy else ()
    if in_place:
        return (outs[0], outs[1]) + tok
    if kv_combined:
        x_out, kv_out = outs[:2]
        kc = lax.dynamic_update_slice(kc, kv_out, (0, 0, pos, 0))
        return (x_out, kc) + tok
    x_out, k_out, v_out = outs[:3]
    kc = lax.dynamic_update_slice(kc, k_out, (0, 0, pos, 0))
    vc = lax.dynamic_update_slice(vc, v_out, (0, 0, pos, 0))
    if kv_quant:
        ks = lax.dynamic_update_slice(k_scales, outs[3], (0, 0, 0, pos))
        vs = lax.dynamic_update_slice(v_scales, outs[4], (0, 0, 0, pos))
        return (x_out, kc, vc, ks, vs) + tok
    return (x_out, kc, vc) + tok
