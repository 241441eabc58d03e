"""Paged decode megakernel: the ENTIRE layer stack of one decode step over a
BLOCK-TABLE addressed KV cache in ONE pallas_call.

This closes the serving architecture gap the reference builds toward: its
paged decode kernel (/root/reference/kernels/triton/attention_kernels.py:
628-808) is the hot loop of its serving runner
(/root/reference/baseline/inference.py:1306-1592) — here the SAME
single-launch megakernel that makes contiguous `generate` fast
(ops/decode_layer.py) is rebuilt for the continuous-batching engine's paged
pools, so the engine serves at kernel speed instead of the per-op
decode_paged path (~100 XLA ops/step).

Differences from the contiguous megakernel (ops/decode_layer.py):
  * the KV cache is the engine's pool [L, NB, bsz, KVd] (FLAT head layout;
    optionally k|v combined on lanes as [L, NB, bsz, 2*KVd]) addressed
    through per-sequence block tables — each cache-scan step issues ONE
    guarded DMA per sequence from the physical block the table names
    (tables + context lengths ride in SMEM; no scalar-prefetch grid, which
    measurably halves pipeline throughput);
  * context lengths are PER-SEQUENCE: the block scan runs to the longest
    sequence's block count, per-sequence DMAs beyond a sequence's context
    are skipped, and scores are masked per sequence;
  * RoPE is per-sequence (cos/sin arrive as [B, lanes] tables built from
    each sequence's position);
  * the current token's K/V are written IN-KERNEL: the pools alias
    input->output and each (layer, sequence) read-modify-writes the
    8-row-aligned slab containing that sequence's write position with two
    small DMAs whose waits are deferred off the critical path (an XLA
    scatter was measured at ~4.1 ms/step against the kernel's 0.5 ms —
    scatter into a tiled 245 MB pool does not lower to an in-place row
    write).

The epilogue streams lm_head chunks through the same weight pipeline and
either keeps a running (max, argmax) for greedy decode (token ids out, no
logits ever reach HBM) or emits the logits chunks themselves (``emit=
"logits"``) so the engine can apply any sampling method.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mlio_tpu.ops.decode_layer import (
    _VMEM_LIMIT,
    NEG_INF,
    _activate,
    _mm,
    _norm,
    _pad,
    _rope_consts,
    decode_vmem_bytes,
)

_NAMES = ["x", "cosq", "sinq", "cosk", "sink", "rotq", "rotk",
          "expand", "group", "ctxv",
          "ln1_scale", "ln1_bias", "wq", "sq", "bq", "wk", "sk", "bk",
          "wv", "sv", "bv", "wo", "so", "bo", "ln2_scale", "ln2_bias",
          "w_up", "s_up", "b_up", "w_gate", "s_gate", "b_gate",
          "w_down", "s_down", "b_down",
          "final_scale", "final_bias", "lm_w", "lm_b",
          "k_pool", "v_pool"]


def _paged_stack_kernel(tab_ref, ctx_ref, *refs, flags, B, Hq, D, bsz,
                        norm, eps, activation, scale, gated, grouped,
                        cdtype, Hkv, L, max_blocks, greedy=None,
                        emit_logits=False, combined=False, kv_depth=3):
    """One grid step == one transformer layer (then lm_head chunks)."""
    it = iter(refs)
    r = {n: (next(it) if flags[n] else None) for n in _NAMES}
    x_out = next(it)
    kp_out = next(it)                      # aliased pool (in-place writes)
    vp_out = None if combined else next(it)
    lg_out = next(it) if emit_logits else None
    tok_out = next(it) if greedy and not emit_logits else None
    x_res, kb = next(it), next(it)
    vb = None if combined else next(it)
    slab_k = next(it)                      # [B, 8, W] RMW staging
    slab_v = None if combined else next(it)
    if greedy and not emit_logits:
        hf_scr, m_tok, i_tok = next(it), next(it), next(it)
    elif emit_logits:
        hf_scr = next(it)
    sems = next(it)

    layer = pl.program_id(0)
    KVd = Hkv * D
    W = 2 * KVd if combined else KVd

    # ---- fused lm_head epilogue (greedy argmax or logits emit) ----
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
                if not emit_logits:
                    m_tok[...] = jnp.full((B, 1), NEG_INF, jnp.float32)
                    i_tok[...] = jnp.zeros((B, 1), jnp.int32)

            hf = hf_scr[...]
            w = r["lm_w"][...]
            if vmajor:
                lg = lax.dot_general(hf, w.astype(hf.dtype),
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            else:
                lg = jnp.dot(hf, w.astype(hf.dtype),
                             preferred_element_type=jnp.float32)
            if r["lm_b"] is not None:
                lg = lg + r["lm_b"][0].astype(jnp.float32)
            col = ej * Vc + lax.broadcasted_iota(jnp.int32, lg.shape, 1)
            lg = jnp.where(col < V, lg, NEG_INF)
            if emit_logits:
                lg_out[...] = lg
            else:
                cmax = jnp.max(lg, axis=1, keepdims=True)
                carg = jnp.min(jnp.where(lg == cmax, col,
                                         jnp.int32(2**31 - 1)),
                               axis=1, keepdims=True)
                upd = cmax > m_tok[...]
                m_tok[...] = jnp.where(upd, cmax, m_tok[...])
                i_tok[...] = jnp.where(upd, carg, i_tok[...])

                @pl.when(layer == pl.num_programs(0) - 1)
                def _():
                    tok_out[...] = jnp.broadcast_to(i_tok[...],
                                                    tok_out.shape)

    @pl.when(layer == 0)
    def _():
        x_res[...] = r["x"][...].astype(jnp.float32)

    @pl.when(layer < L)
    def _layer_body():
        # per-sequence context (past tokens in the cache) as SMEM scalars
        ctx_s = [ctx_ref[b, 0] for b in range(B)]
        nb = functools.reduce(jnp.maximum, ctx_s)            # longest ctx
        nb = (nb + bsz - 1) // bsz                           # blocks to scan

        nsem = 1 if combined else 2
        base_r = kv_depth * B * nsem       # slab-read semaphores
        base_w = base_r + B * nsem         # slab-write semaphores

        def slab_rw(b, write):
            """Copies for sequence b's 8-row RMW slab (the aligned slab of
            the pool block containing b's write position)."""
            off = ctx_s[b]
            blk = tab_ref[b, off // bsz]
            off_al = pl.multiple_of(((off % bsz) // 8) * 8, 8)
            pairs = ((kp_out, kp_out, slab_k, 0),) if combined else (
                (kp_out, kp_out, slab_k, 0),
                (vp_out, vp_out, slab_v, 1))
            cps = []
            for src, dst, scr, which in pairs:
                sem = sems.at[(base_w if write else base_r)
                              + b * nsem + which]
                if write:
                    cps.append(pltpu.make_async_copy(
                        scr.at[b], dst.at[layer, blk, pl.ds(off_al, 8)],
                        sem))
                else:
                    cps.append(pltpu.make_async_copy(
                        src.at[layer, blk, pl.ds(off_al, 8)], scr.at[b],
                        sem))
            return cps

        # the previous layer's slab WRITES (deferred off its critical
        # path) must land before their staging scratch is reused
        @pl.when(layer > 0)
        def _():
            for b in range(B):
                for c in slab_rw(b, True):
                    c.wait()
        # this layer's slab reads overlap the whole layer's compute (the
        # block scan also reads this region — read-read overlap is safe)
        for b in range(B):
            for c in slab_rw(b, False):
                c.start()

        def kv_copies(j, slot, b):
            # reads go through the ALIASED OUTPUT refs: same buffer on TPU,
            # and interpret mode implements aliasing by buffer handoff so
            # intra-kernel writes are only visible through the output
            blk = tab_ref[b, jnp.minimum(j, max_blocks - 1)]
            kr = pltpu.make_async_copy(
                kp_out.at[layer, blk], kb.at[slot, b],
                sems.at[(slot * B + b) * nsem])
            if combined:
                return (kr,)
            vr = pltpu.make_async_copy(
                vp_out.at[layer, blk], vb.at[slot, b],
                sems.at[(slot * B + b) * nsem + 1])
            return kr, vr

        # depth-deep streaming: per-seq block DMAs are guarded by that
        # sequence's context (skipped blocks are also skipped at wait time
        # — guards match exactly)
        for d in range(kv_depth):
            for b in range(B):
                @pl.when(d * bsz < ctx_s[b])
                def _(d=d, b=b):
                    for c in kv_copies(d, d, b):
                        c.start()

        x32 = x_res[...]
        h16 = _norm(x32, r["ln1_scale"], r["ln1_bias"], norm, eps
                    ).astype(cdtype)
        q = _mm(h16, r["wq"], r["bq"], r["sq"])              # [B, Qd] f32
        k = _mm(h16, r["wk"], r["bk"], r["sk"])              # [B, KVd]
        v = _mm(h16, r["wv"], r["bv"], r["sv"])
        if r["rotq"] is not None:
            # per-sequence RoPE: cos/sin are [B, lanes]
            q = (q * r["cosq"][...].astype(jnp.float32)
                 + jnp.dot(q, r["rotq"][...].astype(jnp.float32),
                           preferred_element_type=jnp.float32)
                 * r["sinq"][...].astype(jnp.float32))
            k = (k * r["cosk"][...].astype(jnp.float32)
                 + jnp.dot(k, r["rotk"][...].astype(jnp.float32),
                           preferred_element_type=jnp.float32)
                 * r["sink"][...].astype(jnp.float32))

        expand = r["expand"][...]                            # [Hq, Qd] 0/1
        expf = expand.astype(jnp.float32)
        bf = cdtype
        qs = q * scale
        qmask = qs[:, :, None] * expand.T[None].astype(jnp.float32)
        if grouped:
            # ONE unbatched dot_general -> [B, Hq, KVd] (a vmapped
            # per-batch dot lowers to a lane-merging tpu.reshape Mosaic
            # rejects; caught by compile_gate on real TPU)
            qmask = lax.dot_general(
                qmask, r["group"][...].astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        qmask = qmask.astype(bf)   # [B, KVd, Hq] / grouped [B, Hq, KVd]

        # per-sequence context thresholds as a [B, 1, Hq] vector (built
        # from SMEM scalars with a select chain — B is small and SMEM
        # refs are scalar-read only)
        bidx = lax.broadcasted_iota(jnp.int32, (B, 1, Hq), 0)
        thr = jnp.zeros((B, 1, Hq), jnp.int32)
        for b in range(B):
            thr = jnp.where(bidx == b, ctx_s[b], thr)

        m0 = jnp.full((B, 1, Hq), NEG_INF, jnp.float32)
        l0 = jnp.zeros((B, 1, Hq), jnp.float32)
        a0 = jnp.zeros((B, Hq * D), jnp.float32)

        def pv_select(pv_hk):
            if grouped:
                pv_hk = lax.dot_general(
                    pv_hk, r["group"][...].astype(jnp.float32),
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # [B, Hq, Qd]
            return jnp.sum(pv_hk * expf[None], axis=1)       # [B, Qd]

        def softmax_update(s, m, l, acc, vals):
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.where(jnp.isneginf(m), 0.0, jnp.exp(m - m_new))
            p = jnp.exp(s - m_new)
            p = jnp.where(jnp.isneginf(s), 0.0, p)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            pv_hk = lax.dot_general(p.astype(vals.dtype), vals,
                                    (((1,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            alpha_lane = jnp.squeeze(lax.dot_general(
                alpha, expf, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), axis=1)
            acc = acc * alpha_lane + pv_select(pv_hk)
            return m_new, l, acc

        def block(j, carry):
            m, l, acc = carry
            slot = lax.rem(j, kv_depth)
            for b in range(B):
                @pl.when(j * bsz < ctx_s[b])
                def _(b=b):
                    for c in kv_copies(j, slot, b):
                        c.wait()
            if combined:
                buf = kb[slot]
                kbv = buf[:, :, :KVd]
                vals = buf[:, :, KVd:]
            else:
                kbv = kb[slot]
                vals = vb[slot]
            s = lax.dot_general(
                kbv, qmask,
                (((2,), (2 if grouped else 1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            col = j * bsz + lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < thr, s, NEG_INF)             # [B, bsz, Hq]
            out = softmax_update(s, m, l, acc, vals)
            for b in range(B):
                @pl.when((j + kv_depth) * bsz < ctx_s[b])
                def _(b=b):
                    for c in kv_copies(j + kv_depth, slot, b):
                        c.start()
            return out

        m, l, acc = lax.fori_loop(0, nb, block, (m0, l0, a0))

        # current token attends to itself (its K/V never left VMEM)
        kf = k.astype(bf)[:, None, :]
        vf = v.astype(bf)[:, None, :]
        s_cur = lax.dot_general(
            kf, qmask, (((2,), (2 if grouped else 1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        m, l, acc = softmax_update(s_cur, m, l, acc, vf)

        # all pool reads for this layer are done: fold the current token's
        # K/V into each sequence's staged slab and write back (deferred —
        # layers 0..L-2 are awaited by the next layer's reuse guard, only
        # the last layer's write sits on the critical path)
        for b in range(B):
            for c in slab_rw(b, False):
                c.wait()

        def _merge(slab, cur):
            Wd = slab.shape[-1]
            rows = lax.broadcasted_iota(jnp.int32, (B, 8, Wd), 1)
            tgt = jnp.zeros((B, 8, Wd), jnp.int32)
            bidx2 = lax.broadcasted_iota(jnp.int32, (B, 8, Wd), 0)
            for b in range(B):
                tgt = jnp.where(bidx2 == b, ctx_s[b] % 8, tgt)
            new = jnp.where(rows == tgt, cur[:, None, :],
                            slab[...].astype(jnp.float32))
            slab[...] = new.astype(slab.dtype)

        if combined:
            _merge(slab_k, jnp.concatenate([k, v], axis=-1))
        else:
            _merge(slab_k, k)
            _merge(slab_v, v)
        for b in range(B):
            for c in slab_rw(b, True):
                c.start()

        @pl.when(layer == L - 1)
        def _():
            for b in range(B):
                for c in slab_rw(b, True):
                    c.wait()

        l_lane = jnp.squeeze(lax.dot_general(
            l, expf, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), axis=1)
        l_safe = jnp.where(l_lane == 0.0, 1.0, l_lane)
        attn = acc / l_safe

        o = _mm(attn.astype(cdtype), r["wo"], r["bo"], r["so"])
        x32 = x32 + o
        h2 = _norm(x32, r["ln2_scale"], r["ln2_bias"], norm, eps
                   ).astype(h16.dtype)
        u = _mm(h2, r["w_up"], r["b_up"], r["s_up"])
        g = (_mm(h2, r["w_gate"], r["b_gate"], r["s_gate"])
             if gated else None)
        act = _activate(u, g, activation).astype(h16.dtype)
        d = _mm(act, r["w_down"], r["b_down"], r["s_down"])
        x32 = x32 + d
        x_res[...] = x32

        @pl.when(layer == L - 1)
        def _():
            x_out[...] = x32.astype(x_out.dtype)


def supports_paged_stack(spec, blocks=None) -> bool:
    """Whether the paged megakernel applies to this model (same VMEM and
    feature constraints as the contiguous megakernel, minus the cache
    terms — pool blocks stream at the engine's block size)."""
    from mlio_tpu.ops.decode_layer import supports_decode_stack

    return supports_decode_stack(spec, blocks=blocks)


def rope_tables_for_paged(spec, positions, Hq, Hkv, dtype=jnp.float32):
    """Per-sequence flat-lane RoPE tables: (cosq, sinq, cosk, sink, rotq,
    rotk) with cos/sin [B, heads*D] built from each sequence's position."""
    from mlio_tpu.models.transformer import rope_cos_sin

    cos, sin = rope_cos_sin(positions, spec.rope_dim, spec.rope_theta,
                            jnp.float32)                     # [B, rot]
    D = spec.head_size
    rot = spec.rope_dim

    def tile(t, pad_val):
        padded = jnp.concatenate(
            [t, jnp.full((t.shape[0], D - rot), pad_val, t.dtype)], axis=1
        ) if D > rot else t
        return padded

    cpad = tile(cos, 1.0)
    spad = tile(sin, 0.0)
    cosq = jnp.tile(cpad, (1, Hq)).astype(dtype)
    sinq = jnp.tile(spad, (1, Hq)).astype(dtype)
    cosk = jnp.tile(cpad, (1, Hkv)).astype(dtype)
    sink = jnp.tile(spad, (1, Hkv)).astype(dtype)
    # signed rotate-half permutation matrices (position-independent)
    _, _, rotq = _rope_consts(spec, jnp.ones((1, rot)), jnp.zeros((1, rot)),
                              Hq, dtype)
    if Hkv != Hq:
        _, _, rotk = _rope_consts(spec, jnp.ones((1, rot)),
                                  jnp.zeros((1, rot)), Hkv, dtype)
    else:
        rotk = rotq
    return cosq, sinq, cosk, sink, rotq, rotk


def decode_paged_stack(
    x: jax.Array,              # [B, H] current-token hidden states
    blocks,                    # stacked per-layer params
    k_pool: jax.Array,         # [L, NB, bsz, KVd] flat (or [.., 2*KVd] combined)
    v_pool: Optional[jax.Array],   # None when combined
    block_tables: jax.Array,   # [B, max_blocks] int32
    context_lens: jax.Array,   # [B] int32: PAST tokens already in the cache
    rope,                      # None or (cosq, sinq, cosk, sink, rotq, rotk)
    *,
    spec,
    scale: Optional[float] = None,
    interpret: bool = False,
    head_norm=None,
    lm_head: Optional[jax.Array] = None,
    lm_head_bias: Optional[jax.Array] = None,
    lm_vmajor: bool = True,
    vocab_chunk: Optional[int] = None,
    vocab_size: Optional[int] = None,
    emit: str = "greedy",      # "greedy" (token ids) | "logits"
    kv_combined: bool = False,
    kv_depth: int = 3,
):
    """One decode step for all sequences over the paged pools.

    Returns (out, k_pool, v_pool) where ``out`` is token ids [B]
    (emit="greedy") or logits [B, Vpad] f32 (emit="logits"). The pools
    alias input->output: the kernel writes the current token's K/V at each
    sequence's write position (= context_lens[b]) itself, so jit callers
    should donate the pools.
    """
    B, H = x.shape
    L, NB, bsz, W = k_pool.shape
    Hq, Hkv, D = spec.num_heads, spec.num_kv_heads, spec.head_size
    KVd = Hkv * D
    if kv_combined:
        assert v_pool is None and W == 2 * KVd
    else:
        assert W == KVd
    G = Hq // Hkv
    if scale is None:
        scale = D ** -0.5
    gated = spec.activation in ("swiglu", "geglu")
    cdtype = x.dtype
    max_blocks = block_tables.shape[1]

    from mlio_tpu.ops.quant import QTensor

    def wq_pair(name):
        w = blocks.get(name)
        if isinstance(w, QTensor):
            assert w.fmt == "int8"
            return w.q, w.scale.astype(jnp.float32)[:, None, :]
        return w, None

    lanes = jnp.arange(Hq * D)
    expand = (lanes[None, :] // D
              == jnp.arange(Hq)[:, None]).astype(cdtype)
    if G > 1:
        kv_lane = jnp.arange(KVd)
        group = ((kv_lane[:, None] // D == (lanes[None, :] // D) // G)
                 & (kv_lane[:, None] % D
                    == lanes[None, :] % D)).astype(cdtype)
    else:
        group = None

    if rope is not None:
        cosq, sinq, cosk, sink, rotq, rotk = rope
    else:
        cosq = sinq = cosk = sink = rotq = rotk = None

    greedy = None
    fin_scale = fin_bias = lm_w = lm_b = None
    n_chunks = 0
    if lm_head is not None:
        assert head_norm is not None
        V = vocab_size or (lm_head.shape[0] if lm_vmajor
                           else lm_head.shape[1])
        Vstore = lm_head.shape[0] if lm_vmajor else lm_head.shape[1]
        Vc = vocab_chunk or min(4096, _pad(V, 128))
        n_chunks = -(-V // Vc)
        Vpad = n_chunks * Vc
        lm_w = lm_head
        if Vpad != Vstore:
            pw = ((0, Vpad - Vstore), (0, 0)) if lm_vmajor else \
                ((0, 0), (0, Vpad - Vstore))
            lm_w = jnp.pad(lm_w, pw)
        fin_scale = head_norm[0][None, :]
        fin_bias = (head_norm[1][None, :]
                    if head_norm[1] is not None else None)
        if lm_head_bias is not None:
            lm_b = jnp.pad(lm_head_bias,
                           (0, Vpad - lm_head_bias.shape[0]))[None, :]
        greedy = (V, Vc, lm_vmajor)
    emit_logits = emit == "logits"
    if emit_logits:
        assert greedy is not None, "emit='logits' needs lm_head + head_norm"

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
        "expand": expand, "group": group, "ctxv": None,
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
        "lm_w": lm_w, "lm_b": lm_b,
        "k_pool": k_pool, "v_pool": None if kv_combined else v_pool,
    }
    _PER_LAYER = {"ln1_scale", "ln1_bias", "wq", "sq", "bq", "wk", "sk",
                  "bk", "wv", "sv", "bv", "wo", "so", "bo", "ln2_scale",
                  "ln2_bias", "w_up", "s_up", "b_up", "w_gate", "s_gate",
                  "b_gate", "w_down", "s_down", "b_down"}
    for n in _PER_LAYER:
        v = operands[n]
        if v is not None and v.ndim == 2:
            operands[n] = v[:, None, :]
    flags = {n: operands[n] is not None for n in _NAMES}

    lclamp = (lambda l: jnp.minimum(l, L - 1)) if greedy else (lambda l: l)

    in_specs = []
    args = []
    flat_idx = {}
    for n in _NAMES:
        v = operands[n]
        if v is None:
            continue
        flat_idx[n] = len(args) + 2  # tables, ctx occupy slots 0-1
        args.append(v)
        if n in ("k_pool", "v_pool"):
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        elif n == "lm_w":
            if lm_vmajor:
                in_specs.append(pl.BlockSpec(
                    (Vc, v.shape[1]),
                    lambda l, *_: (jnp.maximum(l - L, 0), 0)))
            else:
                in_specs.append(pl.BlockSpec(
                    (v.shape[0], Vc),
                    lambda l, *_: (0, jnp.maximum(l - L, 0))))
        elif n == "lm_b":
            in_specs.append(pl.BlockSpec(
                (1, Vc), lambda l, *_: (0, jnp.maximum(l - L, 0))))
        elif n in _PER_LAYER:
            shape = v.shape
            in_specs.append(pl.BlockSpec(
                (1,) + shape[1:],
                lambda l, *_, _nd=v.ndim: (lclamp(l),) + (0,) * (_nd - 1)))
        else:
            in_specs.append(pl.BlockSpec(
                v.shape, lambda l, *_, _nd=v.ndim: (0,) * _nd))

    out_specs = [pl.BlockSpec(x.shape, lambda l, *_: (0, 0)),
                 pl.BlockSpec(memory_space=pl.ANY)]
    out_shape = [jax.ShapeDtypeStruct((B, H), x.dtype),
                 jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype)]
    aliases = {flat_idx["k_pool"]: 1}
    if not kv_combined:
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype))
        aliases[flat_idx["v_pool"]] = 2
    if emit_logits:
        out_specs.append(pl.BlockSpec(
            (B, Vc), lambda l, *_: (0, jnp.maximum(l - L, 0))))
        out_shape.append(jax.ShapeDtypeStruct((B, n_chunks * Vc),
                                              jnp.float32))
    elif greedy:
        out_specs.append(pl.BlockSpec((B, 128), lambda l, *_: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, 128), jnp.int32))

    kernel = functools.partial(
        _paged_stack_kernel, flags=flags, B=B, Hq=Hq, D=D, bsz=bsz,
        norm=spec.norm, eps=spec.norm_eps, activation=spec.activation,
        scale=scale, gated=gated, grouped=G > 1, cdtype=cdtype,
        Hkv=Hkv, L=L, max_blocks=max_blocks, greedy=greedy,
        emit_logits=emit_logits, combined=kv_combined, kv_depth=kv_depth)

    nbuf = max(kv_depth, 1)
    scratch = [pltpu.VMEM((B, H), jnp.float32)]              # residual
    if kv_combined:
        scratch.append(pltpu.VMEM((nbuf, B, bsz, 2 * KVd), k_pool.dtype))
        scratch.append(pltpu.VMEM((B, 8, 2 * KVd), k_pool.dtype))  # slab
    else:
        scratch += [pltpu.VMEM((nbuf, B, bsz, KVd), k_pool.dtype),
                    pltpu.VMEM((nbuf, B, bsz, KVd), v_pool.dtype),
                    pltpu.VMEM((B, 8, KVd), k_pool.dtype),     # k slab
                    pltpu.VMEM((B, 8, KVd), v_pool.dtype)]     # v slab
    if greedy and not emit_logits:
        scratch += [pltpu.VMEM((B, H), cdtype),
                    pltpu.VMEM((B, 1), jnp.float32),
                    pltpu.VMEM((B, 1), jnp.int32)]
    elif emit_logits:
        scratch.append(pltpu.VMEM((B, H), cdtype))
    nsem = 1 if kv_combined else 2
    n_sems = (nbuf + 2) * B * nsem  # block reads + slab reads + slab writes
    scratch.append(pltpu.SemaphoreType.DMA((n_sems,)))

    tab_spec = pl.BlockSpec(block_tables.shape, lambda l, *_: (0, 0),
                            memory_space=pltpu.SMEM)
    ctx_spec = pl.BlockSpec((B, 1), lambda l, *_: (0, 0),
                            memory_space=pltpu.SMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(L + n_chunks,),
        in_specs=[tab_spec, ctx_spec] + in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        out_shape=tuple(out_shape),
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(block_tables.astype(jnp.int32),
      context_lens.astype(jnp.int32).reshape(B, 1), *args)

    x_out = outs[0]
    kp_out = outs[1]
    vp_out = None if kv_combined else outs[2]
    last = outs[-1]
    if emit_logits:
        return last, kp_out, vp_out
    if greedy:
        return last[:, 0], kp_out, vp_out
    return x_out, kp_out, vp_out


