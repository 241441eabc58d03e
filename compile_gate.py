"""Chip-side Pallas compile gate: compile (NOT run) every shipped kernel ×
shipped block-spec class on the real TPU and fail loudly.

Why this exists: interpreter-mode CPU tests cannot catch Mosaic layout
violations — round 4 shipped two bugs (int4 group-scale blocks, int8-cache
slab alignment) that only surfaced on real hardware. This gate lowers each
kernel class through the real Mosaic compiler via ``jit(f).lower().compile()``
without executing, so a layout-illegal block spec fails the bench job
instead of a user.

Shapes are scaled down (2 layers, small batch) but keep every layout-
relevant property of the shipping classes: lane alignments, combined-vs-
split caches, quantized scale layouts, grid structures.

Run standalone (``python compile_gate.py [entry ...]``) or as the
``compile-gate`` scenario of run_benches.py.
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp


def _spec(name="gpt2", **kw):
    from mlio_tpu.models import get_spec

    return dataclasses.replace(get_spec(name), **kw)


def _params(spec, dtype=jnp.bfloat16, quant=None):
    from mlio_tpu.models import init_params

    params = init_params(spec, jax.random.PRNGKey(0), dtype=dtype)
    if quant:
        from mlio_tpu.runtime.quantization import quantize_params

        params = quantize_params(params, spec, quant)
    return params


def _gen_entry(spec, params, decode_stack, cache_quant=None, method=None):
    from mlio_tpu.models.transformer import Impl
    from mlio_tpu.runtime.generate import generate

    impl = Impl(attention="flash", norm="fused", decode_stack=decode_stack,
                interpret=False)
    ids = jnp.zeros((8, 16), jnp.int32)

    def f(params, ids):
        return generate(params, spec, ids, max_new_tokens=8, impl=impl,
                        cache_len=256, cache_quant=cache_quant,
                        method=method)
    return f, (params, ids)


# ---------------------------------------------------------------------------
# entries: name -> builder() -> (fn, args)
# ---------------------------------------------------------------------------

def mega_bf16_multi():
    """Contiguous decode megakernel, combined cache, multi-step in-kernel
    grid, fused greedy epilogue + embedding capture (the headline class)."""
    spec = _spec("gpt2", num_layers=2)
    return _gen_entry(spec, _params(spec), "mega")


def mega_int8_w_kv():
    """Megakernel with INT8 weights (QTensor streaming) + INT8 KV cache
    (transposed sublane-padded scale slabs — the round-4 layout bug class)."""
    spec = _spec("gpt2", num_layers=2)
    return _gen_entry(spec, _params(spec, quant="int8"), "mega",
                      cache_quant="int8")


def mega_split_rope():
    """Megakernel split-cache + RoPE/GQA class (non-128-aligned kv_dim)."""
    spec = _spec("llama2-7b", num_layers=2, hidden_size=512, num_heads=8,
                 num_kv_heads=4, head_dim=64, intermediate_size=1024,
                 vocab_size=4096, tie_embeddings=True)
    return _gen_entry(spec, _params(spec), "mega")


def scan_decode():
    """Per-op scan decode path (decode_attention batched flash + fused
    norms/LN-QKV + cache updates)."""
    spec = _spec("gpt2", num_layers=2)
    return _gen_entry(spec, _params(spec), "scan")


def tiled_int8():
    """Tiled decode megakernel (7B class): INT8 weights + INT8 KV."""
    spec = _spec("llama2-7b", num_layers=2)
    return _gen_entry(spec, _params(spec, quant="int8"), "tiled",
                      cache_quant="int8")


def scan_int4():
    """INT4 grouped-weight decode (group-scale matmul kernel class) — int4
    routes through the per-op scan path's dequant-fused matmuls."""
    spec = _spec("llama2-7b", num_layers=2)
    return _gen_entry(spec, _params(spec, quant="int4"), "scan")


def tiled_fp8():
    """Tiled decode with fp8 weights (bit-assembly dequant class)."""
    spec = _spec("llama2-7b", num_layers=2)
    return _gen_entry(spec, _params(spec, quant="fp8"), "tiled")


def tiled_moe():
    """Tiled decode MoE variant (in-kernel router + expert streaming)."""
    spec = _spec("mixtral-8x7b", num_layers=2)
    return _gen_entry(spec, _params(spec, quant="int8"), "tiled",
                      cache_quant="int8")


def tiled_moe_single_chunk():
    """MoE tiled decode where the whole expert MLP fits one chunk (Km=1,
    the moe-13b bench geometry): the chunk-start becomes a static slice —
    a DIFFERENT Mosaic load-lowering path from the chunked mixtral class
    (the raw-traced-scalar start hit 'Too many leaves for PyTreeDef'
    while pl.multiple_of-wrapped starts did not; caught round 5)."""
    import dataclasses

    spec = dataclasses.replace(
        _spec("mixtral-8x7b", num_layers=2), name="moe-13b",
        hidden_size=2048, num_heads=16, num_kv_heads=4,
        intermediate_size=5632, vocab_size=32000)
    return _gen_entry(spec, _params(spec, quant="int8"), "tiled",
                      cache_quant="int8")


def paged_mega_greedy():
    """Paged decode megakernel: combined pools, block tables in SMEM,
    in-kernel slab writes, greedy epilogue (the engine's hot loop)."""
    from mlio_tpu.runtime.engine import _decode_mega_steps
    from mlio_tpu.runtime.sampling import SamplingMethod
    from mlio_tpu.ops.decode_layer import pad_lm_head_for_mega

    spec = _spec("gpt2", num_layers=2)
    params = _params(spec)
    lm_w, lm_V, lm_Vc = pad_lm_head_for_mega(params["tok_embed"], True)
    kp = jnp.zeros((2, 32, 128, 2 * spec.kv_dim), jnp.bfloat16)
    tables = jnp.zeros((8, 4), jnp.int32)
    ctx = jnp.ones((8,), jnp.int32)
    cur = jnp.zeros((8,), jnp.int32)

    def f(params, lm_w, cur, kp, tables, ctx):
        return _decode_mega_steps(
            params, lm_w, cur, kp, None, tables, ctx,
            jax.random.PRNGKey(0), spec=spec, k=4,
            method=SamplingMethod(temperature=0.0), kv_combined=True,
            interpret=False, lm_vmajor=True, lm_V=lm_V, lm_Vc=lm_Vc)
    return f, (params, lm_w, cur, kp, tables, ctx)


def paged_mega_logits():
    """Paged megakernel split pools + streamed-logits emit (sampling)."""
    from mlio_tpu.runtime.engine import _decode_mega_steps
    from mlio_tpu.runtime.sampling import SamplingMethod
    from mlio_tpu.ops.decode_layer import pad_lm_head_for_mega

    spec = _spec("llama2-7b", num_layers=2, hidden_size=512, num_heads=8,
                 num_kv_heads=4, head_dim=64, intermediate_size=1024,
                 vocab_size=4096, tie_embeddings=True)
    params = _params(spec)
    lm_w, lm_V, lm_Vc = pad_lm_head_for_mega(params["tok_embed"], True)
    kp = jnp.zeros((2, 32, 128, spec.kv_dim), jnp.bfloat16)
    vp = jnp.zeros_like(kp)
    tables = jnp.zeros((8, 4), jnp.int32)
    ctx = jnp.ones((8,), jnp.int32)
    cur = jnp.zeros((8,), jnp.int32)

    def f(params, lm_w, cur, kp, vp, tables, ctx):
        return _decode_mega_steps(
            params, lm_w, cur, kp, vp, tables, ctx, jax.random.PRNGKey(0),
            spec=spec, k=2, method=SamplingMethod(temperature=1.0),
            kv_combined=False, interpret=False, lm_vmajor=True,
            lm_V=lm_V, lm_Vc=lm_Vc)
    return f, (params, lm_w, cur, kp, vp, tables, ctx)


def paged_attention_op():
    """Per-op paged attention (scalar-prefetch block tables), bf16 + int8."""
    from mlio_tpu.ops.paged_attention import init_kv_pools, paged_attention

    kp, vp = init_kv_pools(2, 32, 4, 16, 128)
    kpq, vpq, ks, vs = init_kv_pools(2, 32, 4, 16, 128, quant="int8")
    q = jnp.zeros((8, 8, 128), jnp.bfloat16)
    tables = jnp.zeros((8, 8), jnp.int32)
    ctx = jnp.ones((8,), jnp.int32)

    def f(q, kp, vp, kpq, vpq, ks, vs, tables, ctx):
        a = paged_attention(q, kp, vp, tables, ctx, layer=0)
        b = paged_attention(q.astype(jnp.bfloat16), kpq, vpq, tables, ctx,
                            layer=0, k_scale_pool=ks, v_scale_pool=vs)
        return a + b
    return f, (q, kp, vp, kpq, vpq, ks, vs, tables, ctx)


def flash_resident():
    """Flash attention fwd+bwd, resident class (S ≤ a few K, d 128)."""
    from mlio_tpu import ops
    from mlio_tpu.models.transformer import Impl

    impl = Impl(attention="flash", interpret=False)
    q = jnp.zeros((1, 1024, 8, 128), jnp.bfloat16)

    def f(q):
        def loss(q):
            return jnp.sum(ops.attention(q, q, q, causal=True, impl=impl)
                           .astype(jnp.float32))
        return jax.grad(loss)(q)
    return f, (q,)


def flash_streamed():
    """Flash attention long-context streamed class (64K tokens)."""
    from mlio_tpu import ops
    from mlio_tpu.models.transformer import Impl

    impl = Impl(attention="flash", interpret=False)
    q = jnp.zeros((1, 65536, 1, 128), jnp.bfloat16)

    def f(q):
        return ops.attention(q, q, q, causal=True, impl=impl)
    return f, (q,)


def fused_pointwise():
    """Fused MLP (gelu + swiglu), fused norms (LN + RMS + residual),
    fused LN+QKV."""
    from mlio_tpu.ops.fused_mlp import fused_mlp
    from mlio_tpu.ops.ln_qkv import fused_ln_qkv
    from mlio_tpu.ops.norms import fused_norm

    x = jnp.zeros((4, 128, 512), jnp.bfloat16)
    wu = jnp.zeros((512, 1024), jnp.bfloat16)
    wd = jnp.zeros((1024, 512), jnp.bfloat16)
    wg = jnp.zeros((512, 1024), jnp.bfloat16)
    sc = jnp.ones((512,), jnp.bfloat16)
    wq = jnp.zeros((512, 512), jnp.bfloat16)

    def f(x, wu, wd, wg, sc, wq):
        a = fused_mlp(x, wu, wd, activation="gelu_new")
        b = fused_mlp(x, wu, wd, w_gate=wg, activation="swiglu")
        c = fused_norm(x, sc, sc, kind="layernorm", residual=x)
        d = fused_norm(x, sc, kind="rmsnorm")
        e, _, _ = fused_ln_qkv(x, sc, sc, wq, None, wq, None, wq, None,
                               kind="layernorm")
        return (jnp.sum(a.astype(jnp.float32))
                + jnp.sum(b.astype(jnp.float32))
                + jnp.sum(c.astype(jnp.float32))
                + jnp.sum(d.astype(jnp.float32))
                + jnp.sum(e.astype(jnp.float32)))
    return f, (x, wu, wd, wg, sc, wq)


def quant_matmuls():
    """Dequant-fused matmul kernels: int8, int4 grouped, fp8 bit-assembly."""
    from mlio_tpu.ops.quant import (fp8_to_bf16, linear, quantize_fp8,
                                    quantize_int4, quantize_int8)

    w = jax.random.normal(jax.random.PRNGKey(0), (512, 1024), jnp.float32)
    q8 = quantize_int8(w)
    q4 = quantize_int4(w, group_size=128)
    qf = quantize_fp8(w)
    x = jnp.zeros((8, 512), jnp.bfloat16)

    def f(x, q8, q4, qf):
        a = linear(x, q8)
        b = linear(x, q4)
        c = x @ fp8_to_bf16(qf.q)
        return (jnp.sum(a.astype(jnp.float32))
                + jnp.sum(b.astype(jnp.float32))
                + jnp.sum(c.astype(jnp.float32)))
    return f, (x, q8, q4, qf)


ENTRIES = {
    "mega-bf16-multi": mega_bf16_multi,
    "mega-int8-w-kv": mega_int8_w_kv,
    "mega-split-rope": mega_split_rope,
    "scan-decode": scan_decode,
    "tiled-int8": tiled_int8,
    "scan-int4": scan_int4,
    "tiled-fp8": tiled_fp8,
    "tiled-moe": tiled_moe,
    "tiled-moe-single-chunk": tiled_moe_single_chunk,
    "paged-mega-greedy": paged_mega_greedy,
    "paged-mega-logits": paged_mega_logits,
    "paged-attention-op": paged_attention_op,
    "flash-resident-fwdbwd": flash_resident,
    "flash-streamed-65k": flash_streamed,
    "fused-pointwise": fused_pointwise,
    "quant-matmuls": quant_matmuls,
}


def run(names=None):
    """Compile every entry; returns a bench-scenario-style dict."""
    detail = {}
    n_pass = 0
    names = names or list(ENTRIES)
    for name in names:
        t0 = time.time()
        try:
            fn, args = ENTRIES[name]()
            jax.jit(fn).lower(*args).compile()
            detail[name] = f"ok ({time.time() - t0:.0f}s)"
            n_pass += 1
        except Exception as e:
            msg = str(e).replace("\n", " ")[:300]
            detail[name] = f"FAIL {type(e).__name__}: {msg}"
        print(f"  {name}: {detail[name]}", file=sys.stderr, flush=True)
    return {"metric": "pallas_compile_gate",
            "value": n_pass, "unit": f"of {len(names)} kernel classes",
            "vs_baseline": 1.0 if n_pass == len(names) else 0.0,
            "detail": detail}


def main():
    res = run(sys.argv[1:] or None)
    import json

    print(json.dumps(res))
    if res["vs_baseline"] < 1.0:
        sys.exit(1)


if __name__ == "__main__":
    main()
