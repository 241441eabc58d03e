"""Differentiable flash attention: Pallas forward-with-LSE + backward.

TPU-native rebuild of the reference's Triton FA backward
(/root/reference/kernels/triton/flash_attention_kernels.py:700-939): the
forward stores per-row softmax statistics (the reference's STORE_L_M path,
:183,307-314 — here a single fused logsumexp), the backward recomputes P
from them, forms delta = rowsum(dO * O) (:813) and produces
dV = P^T dO, dP = dO V^T, dS = P (dP - delta), dK = dS^T Q, dQ = dS K.

Design divergence from the Triton kernel (deliberate, TPU-first):
  * The reference accumulates dK/dV across query blocks with atomic adds
    (:912-916). TPU Pallas has no global atomics — and doesn't need them:
    the dK/dV kernel runs one program per (batch, head, kv-block) and loops
    over query blocks *inside* the kernel, so accumulation happens in a VMEM
    register accumulator instead of contended HBM atomics. dQ gets the dual
    kernel (per q-block, loop over kv). Two clean passes beat one atomic
    pass on this hardware.
  * GQA: dK/dV are produced per *query* head and group-summed outside the
    kernel (XLA fuses the reshape-sum); the fp8 ortho-matrix path (:925-928)
    is unnecessary at per-channel quantization granularity (see ops/quant).

Exposed as ``flash_attention_vjp`` — a ``jax.custom_vjp`` function whose
forward matches ops.flash_attention semantics (causal, scale) for the
training shapes the reference backward supports (full self-attention, no
paged cache).
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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Forward with logsumexp residual
# ---------------------------------------------------------------------------

def _fwd_lse_kernel(*refs, scale: float,
                    block_kv: int, causal: bool, skv: int, kvlen: int,
                    dropout_rate: float = 0.0):
    if dropout_rate > 0.0:
        seed_ref, *refs = refs
    q_ref, k_ref, v_ref, o_ref, lse_ref = refs
    qi = pl.program_id(2)
    if dropout_rate > 0.0:
        from mlio_tpu.ops.dropmask import fold_seed

        seed_eff = fold_seed(seed_ref[0, 0], pl.program_id(0),
                             pl.program_id(1))
    bq = q_ref.shape[2]
    D = q_ref.shape[3]

    q = (q_ref[0, 0].astype(jnp.float32) * scale).astype(q_ref.dtype)
    q_start = qi * bq

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, D), jnp.float32)

    limit = min(pl.cdiv(skv, block_kv), pl.cdiv(kvlen, block_kv))
    if causal:
        limit = jnp.minimum(limit, pl.cdiv(q_start + bq, block_kv))

    row = q_start + lax.broadcasted_iota(jnp.int32, (bq, block_kv), 0)

    def body(j, carry):
        m, l, acc = carry
        ks = k_ref[0, 0, pl.ds(j * block_kv, block_kv), :]
        vs = v_ref[0, 0, pl.ds(j * block_kv, block_kv), :]
        s = lax.dot_general(q, ks, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        col = j * block_kv + lax.broadcasted_iota(jnp.int32, (bq, block_kv), 1)
        mask = col < kvlen
        if causal:
            mask = jnp.logical_and(mask, row >= col)
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        m_safe = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
        alpha = jnp.where(jnp.isneginf(m), 0.0, jnp.exp(m - m_safe))
        p = jnp.where(mask, jnp.exp(s - m_safe), 0.0)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv_p = p
        if dropout_rate > 0.0:
            from mlio_tpu.ops.dropmask import keep_u01

            keep = keep_u01(row, col, seed_eff) >= jnp.float32(dropout_rate)
            pv_p = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - dropout_rate))
        pv = lax.dot_general(pv_p.astype(vs.dtype), vs,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        acc = acc * alpha + pv
        return m_new, l, acc

    m, l, acc = lax.fori_loop(0, limit, body, (m0, l0, acc0))
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / l_safe).astype(o_ref.dtype)
    # logsumexp of the scaled scores; -inf rows (fully masked) stay -inf.
    lse = jnp.where(jnp.isneginf(m), NEG_INF, m + jnp.log(l_safe))
    # row stats ride as [B, Hq, 8, sq]: a (1, bq) block of a 3D [B,Hq,sq]
    # layout is Mosaic-illegal (last-two dims (1, bq)); the 8-sublane
    # broadcast makes every stats block (8, bq) — caught by compile_gate
    lse_ref[0, 0] = jnp.broadcast_to(lse[:, 0][None, :],
                                     lse_ref.shape[2:])


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(*refs, scale: float, block_kv: int, causal: bool,
                   skv: int, kvlen: int, dropout_rate: float = 0.0):
    """One program per (b, h, q-block); loops kv blocks, accumulates dQ."""
    if dropout_rate > 0.0:
        seed_ref, *refs = refs
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref = refs
    qi = pl.program_id(2)
    if dropout_rate > 0.0:
        from mlio_tpu.ops.dropmask import fold_seed

        seed_eff = fold_seed(seed_ref[0, 0], pl.program_id(0),
                             pl.program_id(1))
    bq = q_ref.shape[2]
    D = q_ref.shape[3]

    q = (q_ref[0, 0].astype(jnp.float32) * scale).astype(q_ref.dtype)
    do = do_ref[0, 0].astype(jnp.float32)                       # [bq, D]
    lse = lse_ref[0, 0, 0].astype(jnp.float32)[:, None]         # [bq, 1]
    lse_safe = jnp.where(jnp.isneginf(lse), 0.0, lse)
    delta = delta_ref[0, 0, 0].astype(jnp.float32)[:, None]     # [bq, 1]
    q_start = qi * bq

    limit = min(pl.cdiv(skv, block_kv), pl.cdiv(kvlen, block_kv))
    if causal:
        limit = jnp.minimum(limit, pl.cdiv(q_start + bq, block_kv))

    row = q_start + lax.broadcasted_iota(jnp.int32, (bq, block_kv), 0)
    acc0 = jnp.zeros((bq, D), jnp.float32)

    def body(j, acc):
        ks = k_ref[0, 0, pl.ds(j * block_kv, block_kv), :]
        vs = v_ref[0, 0, pl.ds(j * block_kv, block_kv), :]
        s = lax.dot_general(q, ks, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        col = j * block_kv + lax.broadcasted_iota(jnp.int32, (bq, block_kv), 1)
        mask = col < kvlen
        if causal:
            mask = jnp.logical_and(mask, row >= col)
        p = jnp.where(mask, jnp.exp(s - lse_safe), 0.0)         # [bq, bkv]
        dp = lax.dot_general(do.astype(vs.dtype), vs, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            # dP = (dO V^T) * Dm; delta == rowsum(P~ dP~) already (see
            # module docstring) so only the dp term is masked here.
            from mlio_tpu.ops.dropmask import keep_u01

            keep = keep_u01(row, col, seed_eff) >= jnp.float32(dropout_rate)
            dp = jnp.where(keep, dp, 0.0) * (1.0 / (1.0 - dropout_rate))
        ds = p * (dp - delta)                                   # [bq, bkv]
        acc = acc + lax.dot_general(ds.astype(ks.dtype), ks,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        return acc

    acc = lax.fori_loop(0, limit, body, acc0)
    dq_ref[0, 0] = (acc * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(*refs, scale: float, block_q: int,
                    causal: bool, sq: int, kvlen: int,
                    dropout_rate: float = 0.0):
    """One program per (b, h, kv-block); loops q blocks, accumulates dK/dV
    in VMEM (replaces the reference's HBM atomic adds, :912-916)."""
    if dropout_rate > 0.0:
        seed_ref, *refs = refs
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref = refs
    ki = pl.program_id(2)
    if dropout_rate > 0.0:
        from mlio_tpu.ops.dropmask import fold_seed

        seed_eff = fold_seed(seed_ref[0, 0], pl.program_id(0),
                             pl.program_id(1))
    bkv = k_ref.shape[2]
    D = k_ref.shape[3]

    ks = k_ref[0, 0]                                            # [bkv, D]
    vs = v_ref[0, 0]
    kv_start = ki * bkv
    col = kv_start + lax.broadcasted_iota(jnp.int32, (block_q, bkv), 1)
    col_valid = col < kvlen

    num_q_blocks = pl.cdiv(sq, block_q)
    # Causal: q blocks strictly above the diagonal contribute nothing.
    start = (kv_start // block_q) if causal else 0

    dk0 = jnp.zeros((bkv, D), jnp.float32)
    dv0 = jnp.zeros((bkv, D), jnp.float32)

    def body(i, carry):
        dk, dv = carry
        qs = (q_ref[0, 0, pl.ds(i * block_q, block_q), :]
              .astype(jnp.float32) * scale).astype(q_ref.dtype)
        do = do_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, 0, pl.ds(i * block_q, block_q)][:, None]
        lse_safe = jnp.where(jnp.isneginf(lse), 0.0, lse)
        delta = delta_ref[0, 0, 0, pl.ds(i * block_q, block_q)][:, None]

        s = lax.dot_general(qs, ks, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [bq, bkv]
        mask = col_valid
        if causal:
            row = (i * block_q
                   + lax.broadcasted_iota(jnp.int32, (block_q, bkv), 0))
            mask = jnp.logical_and(mask, row >= col)
        p = jnp.where(mask, jnp.exp(s - lse_safe), 0.0)
        p_drop = p
        dp = lax.dot_general(do.astype(vs.dtype), vs, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            from mlio_tpu.ops.dropmask import keep_u01

            row_d = (i * block_q
                     + lax.broadcasted_iota(jnp.int32, (block_q, bkv), 0))
            keep = keep_u01(row_d, col, seed_eff) \
                >= jnp.float32(dropout_rate)
            inv = 1.0 / (1.0 - dropout_rate)
            p_drop = jnp.where(keep, p, 0.0) * inv  # P~ = P * Dm
            dp = jnp.where(keep, dp, 0.0) * inv     # dP = (dO V^T) * Dm
        # dV += P~^T dO
        dv = dv + lax.dot_general(p_drop.astype(do_ref.dtype),
                                  do.astype(do_ref.dtype),
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ds = p * (dp - delta)                                   # [bq, bkv]
        # dK += dS^T Q_scaled  (scale already folded into qs)
        dk = dk + lax.dot_general(ds.astype(qs.dtype), qs,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return dk, dv

    dk, dv = lax.fori_loop(start, num_q_blocks, body, (dk0, dv0))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

def _fwd_impl(q, k, v, seed, causal, scale, block_q, block_kv, interpret,
              dropout_rate):
    B, Sq, Hq, D = q.shape
    _, Skv, Hkv, _ = k.shape
    group = Hq // Hkv
    bq = min(block_q, _round_up(Sq, 8))
    bkv = min(block_kv, _round_up(Skv, 128))

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    sq_pad = _round_up(Sq, bq)
    skv_pad = _round_up(Skv, bkv)
    if sq_pad != Sq:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, sq_pad - Sq), (0, 0)))
    if skv_pad != Skv:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, skv_pad - Skv), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, skv_pad - Skv), (0, 0)))

    grid = (B, Hq, sq_pad // bq)
    kernel = functools.partial(_fwd_lse_kernel, scale=scale, block_kv=bkv,
                               causal=causal, skv=skv_pad, kvlen=Skv,
                               dropout_rate=dropout_rate)
    seed_args, seed_specs = _seed_operand(seed, dropout_rate)
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=seed_specs + [
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, skv_pad, D),
                         lambda b, h, i, g=group: (b, h // g, 0, 0)),
            pl.BlockSpec((1, 1, skv_pad, D),
                         lambda b, h, i, g=group: (b, h // g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, 8, bq), lambda b, h, i: (b, h, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, sq_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hq, 8, sq_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*seed_args, qt, kt, vt)
    out = o[:, :, :Sq, :].transpose(0, 2, 1, 3)
    return out, (o, lse, qt, kt, vt)


def _seed_operand(seed, dropout_rate):
    """(args, specs) for the optional (1,1) SMEM dropout-seed operand."""
    if dropout_rate <= 0.0:
        return [], []
    arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    return [arr], [pl.BlockSpec((1, 1), lambda *_: (0, 0),
                                memory_space=pltpu.SMEM)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def flash_attention_vjp(q, k, v, dropout_seed=0, causal: bool = True,
                        scale: Optional[float] = None, block_q: int = 256,
                        block_kv: int = 512, interpret: bool = False,
                        dropout_rate: float = 0.0):
    """Differentiable flash attention. q [B,Sq,Hq,D], k/v [B,Skv,Hkv,D].

    ``dropout_rate``/``dropout_seed``: position-hashed attention dropout
    (ops/dropmask.py) — forward and backward regenerate identical masks with
    no stored mask tensor. The seed is a traced scalar (no retrace per
    training step); it carries a zero cotangent."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out, _ = _fwd_impl(q, k, v, dropout_seed, causal, scale, block_q,
                       block_kv, interpret, dropout_rate)
    return out


def _vjp_fwd(q, k, v, dropout_seed, causal, scale, block_q, block_kv,
             interpret, dropout_rate):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out, (o_pad, lse, qt, kt, vt) = _fwd_impl(
        q, k, v, dropout_seed, causal, scale, block_q, block_kv, interpret,
        dropout_rate)
    return out, (o_pad, lse, qt, kt, vt, q.shape, k.shape, dropout_seed)


def _vjp_bwd(causal, scale, block_q, block_kv, interpret, dropout_rate,
             res, g):
    o_pad, lse, qt, kt, vt, q_shape, k_shape, dropout_seed = res
    B, Sq, Hq, D = q_shape
    _, Skv, Hkv, _ = k_shape
    group = Hq // Hkv
    if scale is None:
        scale = D ** -0.5
    sq_pad, skv_pad = qt.shape[2], kt.shape[2]
    bq = min(block_q, sq_pad)
    bkv = min(block_kv, skv_pad)

    do = g.transpose(0, 2, 1, 3)                                # [B,Hq,Sq,D]
    if sq_pad != Sq:
        do = jnp.pad(do, ((0, 0), (0, 0), (0, sq_pad - Sq), (0, 0)))
    # delta = rowsum(dO * O) (reference :813) — elementwise, XLA fuses it.
    delta = jnp.sum(do.astype(jnp.float32) * o_pad.astype(jnp.float32),
                    axis=-1)                                    # [B,Hq,sq_pad]
    delta = jnp.broadcast_to(delta[:, :, None, :],
                             (B, Hq, 8, sq_pad))  # stats slab layout

    q_spec = pl.BlockSpec((1, 1, bq, D), lambda b, h, i: (b, h, i, 0))
    qfull_spec = pl.BlockSpec((1, 1, sq_pad, D), lambda b, h, i: (b, h, 0, 0))
    kv_spec = pl.BlockSpec((1, 1, skv_pad, D),
                           lambda b, h, i, g_=group: (b, h // g_, 0, 0))
    kvblk_spec = pl.BlockSpec((1, 1, bkv, D),
                              lambda b, h, i, g_=group: (b, h // g_, i, 0))
    row_spec = pl.BlockSpec((1, 1, 8, bq), lambda b, h, i: (b, h, 0, i))
    rowfull_spec = pl.BlockSpec((1, 1, 8, sq_pad),
                                lambda b, h, i: (b, h, 0, 0))

    seed_args, seed_specs = _seed_operand(dropout_seed, dropout_rate)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_kv=bkv,
                          causal=causal, skv=skv_pad, kvlen=Skv,
                          dropout_rate=dropout_rate),
        grid=(B, Hq, sq_pad // bq),
        in_specs=seed_specs + [q_spec, kv_spec, kv_spec, q_spec, row_spec,
                               row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, sq_pad, D), qt.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*seed_args, qt, kt, vt, do, lse, delta)

    dk_full, dv_full = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, block_q=bq,
                          causal=causal, sq=sq_pad, kvlen=Skv,
                          dropout_rate=dropout_rate),
        grid=(B, Hq, skv_pad // bkv),
        in_specs=seed_specs + [qfull_spec, kvblk_spec, kvblk_spec,
                               qfull_spec, rowfull_spec, rowfull_spec],
        out_specs=[
            pl.BlockSpec((1, 1, bkv, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bkv, D), lambda b, h, i: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, skv_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Hq, skv_pad, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*seed_args, qt, kt, vt, do, lse, delta)

    # GQA: sum grads over the query heads sharing each KV head.
    dk_full = dk_full.reshape(B, Hkv, group, skv_pad, D).sum(axis=2)
    dv_full = dv_full.reshape(B, Hkv, group, skv_pad, D).sum(axis=2)

    dq = dq[:, :, :Sq, :].transpose(0, 2, 1, 3)
    dk = dk_full[:, :, :Skv, :].transpose(0, 2, 1, 3).astype(kt.dtype)
    dv = dv_full[:, :, :Skv, :].transpose(0, 2, 1, 3).astype(vt.dtype)
    seed_ct = jax.tree_util.tree_map(
        lambda x: jnp.zeros(jnp.shape(x),
                            jax.dtypes.float0
                            if jnp.issubdtype(jnp.asarray(x).dtype,
                                              jnp.integer)
                            else jnp.asarray(x).dtype), dropout_seed)
    return dq, dk, dv, seed_ct


flash_attention_vjp.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def flash_attention_diff(q, k, v, dropout_seed=0, causal: bool = True,
                         scale: Optional[float] = None,
                         block_q: Optional[int] = None,
                         block_kv: Optional[int] = None,
                         interpret: bool = False,
                         dropout_rate: float = 0.0):
    """Differentiable wrapper whose PRIMAL is the full tuned forward kernel
    (ops/flash_attention.py — autotuned blocks, streamed long-context path),
    so wrapping costs inference nothing. The backward recomputes (o, lse)
    with the vjp forward and runs the flash backward kernel — flash-style
    recomputation instead of saving stats from the tuned forward (whose
    streamed variants don't emit lse). Lets jax.grad flow through the
    ops.attention dispatcher (the reference's flash autograd surface,
    flash_attention_kernels.py:947-1566)."""
    from mlio_tpu.ops.flash_attention import flash_attention

    return flash_attention(q, k, v, causal=causal, scale=scale,
                           block_q=block_q, block_kv=block_kv,
                           interpret=interpret, dropout_rate=dropout_rate,
                           dropout_seed=dropout_seed)


def _diff_fwd(q, k, v, dropout_seed, causal, scale, block_q, block_kv,
              interpret, dropout_rate):
    from mlio_tpu.ops.flash_attention import flash_attention

    out = flash_attention(q, k, v, causal=causal, scale=scale,
                          block_q=block_q, block_kv=block_kv,
                          interpret=interpret, dropout_rate=dropout_rate,
                          dropout_seed=dropout_seed)
    return out, (q, k, v, dropout_seed)


def _diff_bwd(causal, scale, block_q, block_kv, interpret, dropout_rate,
              res, g):
    q, k, v, dropout_seed = res
    bq = block_q or 256
    bkv = block_kv or 512
    sc = scale if scale is not None else q.shape[-1] ** -0.5
    _, resid = _vjp_fwd(q, k, v, dropout_seed, causal, sc, bq, bkv,
                        interpret, dropout_rate)
    return _vjp_bwd(causal, sc, bq, bkv, interpret, dropout_rate, resid, g)


flash_attention_diff.defvjp(_diff_fwd, _diff_bwd)
