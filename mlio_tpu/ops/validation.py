"""Per-kernel validation + benchmark surface.

Reference parity: every Triton kernel module in the reference ships inline
``validate_*`` / ``benchmark_*`` / ``compare_with_*`` functions
(validate_fused_mlp /root/reference/kernels/triton/mlp_kernels.py:925,
benchmark_fused_mlp mlp_kernels.py:810, profile_memory_usage
mlp_kernels.py:1003, benchmark_flash_attention_speed
/root/reference/kernels/attention/flash_attention.py:1171,
compare_with_standard_attention flash_attention_kernels.py:1876,
compare_with_torch_layernorm layernorm_kernels.py:428,
compare_with_unfused_implementation fused_layernorm_qkv.py:840). This module
is the TPU-native equivalent, centralized: each optimized Pallas path is
diffed against its pure-jnp twin (:mod:`mlio_tpu.ops.reference`) under the
reference's 1e-3 max-diff gate, and timed with a dispatch-cancelling
methodology that is valid on remote TPU backends (single-dispatch timing is
meaningless at ~20ms per dispatch; we time a ``lax.scan`` of the op at two
lengths and report the marginal).

All functions return plain dicts so benchmark reporting / the dashboard can
consume them directly.
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from mlio_tpu.models.transformer import Impl
from mlio_tpu.ops import attention, fused_ln_qkv, mlp, norm
from mlio_tpu.ops.reference import (
    attention_reference,
    layernorm_reference,
    mlp_reference,
    rmsnorm_reference,
)

DEFAULT_TOL = 1e-3  # the reference's kernel gate (mlp_kernels.py:986)


def _max_diff(a: jax.Array, b: jax.Array) -> float:
    return float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                 - b.astype(jnp.float32))))


def _verdict(name: str, diff: float, tol: float, extra=None) -> Dict:
    out = {"kernel": name, "max_abs_diff": diff, "tol": tol,
           "passed": bool(diff < tol)}
    if extra:
        out.update(extra)
    return out


def benchmark_op(fn: Callable[[], jax.Array], *, short: int = 16,
                 long: int = 48) -> Dict:
    """Time one op with the two-length scan marginal.

    Runs ``lax.scan`` of ``fn`` (a thunk closing over device args; must
    return an array) at ``short`` and ``long`` iterations inside a single
    jit each, and reports ``(t_long - t_short) / (long - short)`` — this
    cancels dispatch latency, compile-cache lookups and host sync, which
    otherwise dominate on a remote TPU backend (~20ms/dispatch). The scan
    carries a perturbation through the input so XLA cannot CSE/DCE the body,
    and the result is reduced to a scalar before fetching.
    """

    def make(n):
        @jax.jit
        def run():
            def body(c, _):
                y = fn()
                # fold the (scalar-reduced) output back into the carry so
                # each iteration depends on the previous one
                return c + jnp.sum(y).astype(jnp.float32) * 1e-30, None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c

        return run

    run_s, run_l = make(short), make(long)
    float(run_s())  # compile + warm both
    float(run_l())
    t0 = time.perf_counter()
    float(run_s())
    ts = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run_l())
    tl = time.perf_counter() - t0
    per_iter = max((tl - ts) / (long - short), 1e-9)
    return {"seconds_per_call": per_iter, "calls_per_sec": 1.0 / per_iter}


def _mk(rng, shape, dtype):
    return jax.random.normal(rng, shape, jnp.float32).astype(dtype) * 0.1


# ---------------------------------------------------------------------------
# Flash attention


def validate_flash_attention(batch=2, seq=256, heads=4, head_dim=64,
                             kv_heads=None, causal=True, dtype=jnp.float32,
                             tol=DEFAULT_TOL, interpret=None) -> Dict:
    """Flash kernel vs dense reference (parity:
    compare_with_standard_attention flash_attention_kernels.py:1876)."""
    kv_heads = kv_heads or heads
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = _mk(ks[0], (batch, seq, heads, head_dim), dtype)
    k = _mk(ks[1], (batch, seq, kv_heads, head_dim), dtype)
    v = _mk(ks[2], (batch, seq, kv_heads, head_dim), dtype)
    impl = Impl(attention="flash", interpret=interpret)
    out = attention(q, k, v, causal=causal, impl=impl)
    ref = attention_reference(q, k, v, causal=causal)
    return _verdict("flash_attention", _max_diff(out, ref), tol,
                    {"shape": [batch, seq, heads, head_dim],
                     "gqa_groups": heads // kv_heads})


def benchmark_flash_attention_speed(batch=2, seq=1024, heads=8, head_dim=64,
                                    dtype=jnp.bfloat16,
                                    interpret=None) -> Dict:
    """Flash vs dense timing + achieved FLOPs (parity:
    benchmark_flash_attention_speed flash_attention.py:1171)."""
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = _mk(ks[0], (batch, seq, heads, head_dim), dtype)
    k = _mk(ks[1], (batch, seq, heads, head_dim), dtype)
    v = _mk(ks[2], (batch, seq, heads, head_dim), dtype)
    impl = Impl(attention="flash", interpret=interpret)
    t_flash = benchmark_op(lambda: attention(q, k, v, impl=impl))
    t_dense = benchmark_op(lambda: attention(q, k, v, impl=None))
    flops = 4 * batch * heads * seq * seq * head_dim  # QK^T + PV, causal ~/2
    return {
        "kernel": "flash_attention",
        "shape": [batch, seq, heads, head_dim],
        "flash_seconds": t_flash["seconds_per_call"],
        "dense_seconds": t_dense["seconds_per_call"],
        "speedup": t_dense["seconds_per_call"] / t_flash["seconds_per_call"],
        "flash_tflops": flops / t_flash["seconds_per_call"] / 1e12,
    }


def benchmark_attention_memory(batch=1, heads=8, head_dim=64,
                               seqs: Sequence[int] = (512, 1024, 2048)) -> Dict:
    """Theoretical memory: dense materializes the [Sq, Skv] score matrix,
    flash keeps O(block) (parity: benchmark_memory_usage
    flash_attention.py:1282 and FA3's memory model :409-460)."""
    rows = []
    for s in seqs:
        dense = batch * heads * s * s * 4  # fp32 scores
        flash = batch * heads * 3 * s * head_dim * 2  # q,k,v tiles resident
        rows.append({"seq": s, "dense_bytes": dense, "flash_bytes": flash,
                     "reduction": dense / max(flash, 1)})
    return {"kernel": "flash_attention", "memory": rows}


# ---------------------------------------------------------------------------
# Fused MLP


def validate_fused_mlp(batch=4, seq=64, hidden=256, intermediate=1024,
                       activation="gelu_new", dtype=jnp.float32,
                       tol=DEFAULT_TOL, interpret=None) -> Dict:
    """Fused-MLP kernel vs dense twin, max-diff gate < 1e-3 (parity:
    validate_fused_mlp mlp_kernels.py:925-1000)."""
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    x = _mk(ks[0], (batch, seq, hidden), dtype)
    w_up = _mk(ks[1], (hidden, intermediate), dtype)
    w_down = _mk(ks[2], (intermediate, hidden), dtype)
    gated = activation in ("swiglu", "geglu")
    w_gate = _mk(ks[3], (hidden, intermediate), dtype) if gated else None
    impl = Impl(mlp="fused", interpret=interpret)
    out = mlp(x, w_up, w_down, w_gate=w_gate, activation=activation,
              impl=impl)
    ref = mlp_reference(x, w_up, w_down, w_gate=w_gate,
                        activation=activation)
    return _verdict(f"fused_mlp_{activation}", _max_diff(out, ref), tol,
                    {"shape": [batch, seq, hidden, intermediate]})


def benchmark_fused_mlp(batch=4, seq=512, hidden=1024, intermediate=4096,
                        activation="gelu_new", dtype=jnp.bfloat16,
                        interpret=None) -> Dict:
    """Fused vs dense MLP timing (parity: benchmark_fused_mlp
    mlp_kernels.py:810)."""
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    x = _mk(ks[0], (batch, seq, hidden), dtype)
    w_up = _mk(ks[1], (hidden, intermediate), dtype)
    w_down = _mk(ks[2], (intermediate, hidden), dtype)
    gated = activation in ("swiglu", "geglu")
    w_gate = _mk(ks[3], (hidden, intermediate), dtype) if gated else None
    impl = Impl(mlp="fused", interpret=interpret)
    t_fused = benchmark_op(lambda: mlp(x, w_up, w_down, w_gate=w_gate,
                                       activation=activation, impl=impl))
    t_dense = benchmark_op(lambda: mlp(x, w_up, w_down, w_gate=w_gate,
                                       activation=activation, impl=None))
    return {
        "kernel": f"fused_mlp_{activation}",
        "shape": [batch, seq, hidden, intermediate],
        "fused_seconds": t_fused["seconds_per_call"],
        "dense_seconds": t_dense["seconds_per_call"],
        "speedup": t_dense["seconds_per_call"] / t_fused["seconds_per_call"],
    }


def profile_mlp_memory(batch=4, seq=512, hidden=1024,
                       intermediate=4096) -> Dict:
    """HBM traffic model: unfused writes + re-reads the [*, intermediate]
    activation; fused keeps it in VMEM (parity: profile_memory_usage
    mlp_kernels.py:1003; the README's 40-60% bandwidth-reduction claim)."""
    tokens = batch * seq
    weights = (2 * hidden * intermediate) * 2
    io = tokens * hidden * 2 * 2
    inter = tokens * intermediate * 2 * 2  # write + read, bf16
    unfused, fused = weights + io + inter, weights + io
    return {"kernel": "fused_mlp", "unfused_bytes": unfused,
            "fused_bytes": fused,
            "bandwidth_reduction": 1 - fused / unfused}


# ---------------------------------------------------------------------------
# Norms


def compare_with_reference_norm(batch=4, seq=128, hidden=512,
                                kind="layernorm", residual=False,
                                dtype=jnp.float32, tol=DEFAULT_TOL,
                                interpret=None) -> Dict:
    """Fused norm kernel vs jnp twin (parity: compare_with_torch_layernorm
    layernorm_kernels.py:428 + the residual variant :112-184)."""
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    x = _mk(ks[0], (batch, seq, hidden), dtype)
    scale = 1.0 + _mk(ks[1], (hidden,), dtype)
    bias = _mk(ks[2], (hidden,), dtype) if kind == "layernorm" else None
    res = _mk(ks[2], (batch, seq, hidden), dtype) if residual else None
    impl = Impl(norm="fused", interpret=interpret)
    out = norm(x, scale, bias, kind=kind, residual=res, impl=impl)
    if kind == "rmsnorm":
        ref = rmsnorm_reference(x, scale, residual=res)
    else:
        ref = layernorm_reference(x, scale, bias, residual=res)
    return _verdict(f"fused_{kind}" + ("_residual" if residual else ""),
                    _max_diff(out, ref), tol)


def benchmark_norm(batch=8, seq=1024, hidden=4096, kind="layernorm",
                   dtype=jnp.bfloat16, interpret=None) -> Dict:
    """Fused vs dense norm timing (parity: benchmark fns
    layernorm_kernels.py:318)."""
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    x = _mk(ks[0], (batch, seq, hidden), dtype)
    scale = 1.0 + _mk(ks[1], (hidden,), dtype)
    bias = _mk(ks[2], (hidden,), dtype) if kind == "layernorm" else None
    impl = Impl(norm="fused", interpret=interpret)
    t_f = benchmark_op(lambda: norm(x, scale, bias, kind=kind, impl=impl))
    t_d = benchmark_op(lambda: norm(x, scale, bias, kind=kind, impl=None))
    return {"kernel": f"fused_{kind}",
            "fused_seconds": t_f["seconds_per_call"],
            "dense_seconds": t_d["seconds_per_call"],
            "speedup": t_d["seconds_per_call"] / t_f["seconds_per_call"]}


# ---------------------------------------------------------------------------
# Fused LN + QKV


def compare_with_unfused_ln_qkv(batch=2, seq=128, hidden=256, heads=4,
                                kv_heads=2, head_dim=64, kind="layernorm",
                                dtype=jnp.float32, tol=DEFAULT_TOL,
                                interpret=None) -> Dict:
    """Fused LN+QKV vs norm-then-matmul (parity:
    compare_with_unfused_implementation fused_layernorm_qkv.py:840;
    GQA-aware like fused_layernorm_qkv.py:58,102)."""
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    x = _mk(ks[0], (batch, seq, hidden), dtype)
    scale = 1.0 + _mk(ks[1], (hidden,), dtype)
    bias = _mk(ks[2], (hidden,), dtype) if kind == "layernorm" else None
    wq = _mk(ks[3], (hidden, heads * head_dim), dtype)
    wk = _mk(ks[4], (hidden, kv_heads * head_dim), dtype)
    wv = _mk(ks[5], (hidden, kv_heads * head_dim), dtype)
    impl = Impl(fused_ln_qkv=True, interpret=interpret)
    q, k, v = fused_ln_qkv(x, scale, bias, wq, None, wk, None, wv, None,
                           kind=kind, impl=impl)
    h = (layernorm_reference(x, scale, bias) if kind == "layernorm"
         else rmsnorm_reference(x, scale))
    diffs = [_max_diff(q, h @ wq), _max_diff(k, h @ wk), _max_diff(v, h @ wv)]
    return _verdict("fused_ln_qkv", max(diffs), tol,
                    {"q_diff": diffs[0], "k_diff": diffs[1],
                     "v_diff": diffs[2]})


# ---------------------------------------------------------------------------
# Ring / paged / decode paths


def validate_ring_attention(batch=1, seq=512, heads=4, head_dim=64,
                            chunk=128, dtype=jnp.float32, tol=DEFAULT_TOL,
                            **_) -> Dict:
    """Chunked ring attention vs dense — the global online-softmax property
    the reference's module-level ring got wrong (SURVEY §2.9.12; correct
    kernel parity: attention_kernels.py:36-202)."""
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q = _mk(ks[0], (batch, seq, heads, head_dim), dtype)
    k = _mk(ks[1], (batch, seq, heads, head_dim), dtype)
    v = _mk(ks[2], (batch, seq, heads, head_dim), dtype)
    impl = Impl(attention="ring", ring_chunk=chunk)
    out = attention(q, k, v, causal=True, impl=impl)
    ref = attention_reference(q, k, v, causal=True)
    return _verdict("ring_attention", _max_diff(out, ref), tol,
                    {"chunk": chunk})


def validate_paged_attention(batch=2, heads=4, kv_heads=2, head_dim=64,
                             block_size=16, ctx=100, num_blocks=32,
                             dtype=jnp.float32, tol=DEFAULT_TOL,
                             interpret=None) -> Dict:
    """Paged decode attention over a scattered block table vs dense over the
    gathered cache (parity: _paged_attention_fwd_kernel
    attention_kernels.py:628-808)."""
    from mlio_tpu.ops.paged_attention import paged_attention

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = _mk(ks[0], (batch, heads, head_dim), dtype)
    kc = _mk(ks[1], (1, num_blocks, block_size, kv_heads, head_dim), dtype)
    vc = _mk(ks[2], (1, num_blocks, block_size, kv_heads, head_dim), dtype)
    nb = -(-ctx // block_size)
    # distinct physical blocks per sequence, interleaved
    table = (jnp.arange(batch)[:, None]
             + batch * jnp.arange(nb)[None, :]).astype(jnp.int32)
    pad = jnp.zeros((batch, num_blocks // batch - nb), jnp.int32)
    table = jnp.concatenate([table, pad], axis=1)
    ctx_lens = jnp.full((batch,), ctx, jnp.int32)
    out = paged_attention(q, kc, vc, table, ctx_lens, layer=0,
                          interpret=interpret)
    # gather the logical KV per sequence and run dense
    kl = kc[0][table.reshape(-1)].reshape(batch, -1, kv_heads, head_dim)
    vl = vc[0][table.reshape(-1)].reshape(batch, -1, kv_heads, head_dim)
    ref = attention_reference(q[:, None], kl, vl, causal=False,
                              kv_len=ctx_lens)[:, 0]
    return _verdict("paged_attention", _max_diff(out, ref), tol,
                    {"ctx": ctx, "block_size": block_size})


def validate_all(interpret: Optional[bool] = None) -> Dict[str, Dict]:
    """Run every kernel's correctness gate; returns {kernel: verdict}."""
    results = [
        validate_flash_attention(interpret=interpret),
        validate_flash_attention(kv_heads=2, interpret=interpret),
        validate_fused_mlp(activation="gelu_new", interpret=interpret),
        validate_fused_mlp(activation="swiglu", interpret=interpret),
        validate_fused_mlp(activation="relu", interpret=interpret),
        compare_with_reference_norm(kind="layernorm", interpret=interpret),
        compare_with_reference_norm(kind="rmsnorm", residual=True,
                                    interpret=interpret),
        compare_with_unfused_ln_qkv(interpret=interpret),
        validate_ring_attention(),
        validate_paged_attention(interpret=interpret),
    ]
    return {r["kernel"]: r for r in results}


__all__ = [
    "DEFAULT_TOL",
    "benchmark_op",
    "validate_flash_attention",
    "benchmark_flash_attention_speed",
    "benchmark_attention_memory",
    "validate_fused_mlp",
    "benchmark_fused_mlp",
    "profile_mlp_memory",
    "compare_with_reference_norm",
    "benchmark_norm",
    "compare_with_unfused_ln_qkv",
    "validate_ring_attention",
    "validate_paged_attention",
    "validate_all",
]
