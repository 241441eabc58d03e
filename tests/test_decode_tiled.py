"""Tiled decode megakernel (ops/decode_tiled.py) vs the per-op scan path.

The tiled kernel streams weight CHUNKS (head groups / intermediate slices)
through a (layers, phases) grid so 7B-class layers that cannot fit VMEM
still decode in one pallas_call per step. Interpreter-mode tests demand
agreement with the lax.scan per-op decode across norms, biases, RoPE, GQA,
gated MLPs, INT8 weights and the INT8 KV cache, including non-divisible
intermediate widths (edge-chunk masking).
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlio_tpu.models import Impl, get_spec, init_params
from mlio_tpu.models.transformer import forward
from mlio_tpu.ops.decode_tiled import (
    Tiling,
    choose_tiling,
    decode_layer_tiled,
    supports_decode_tiled,
)
from mlio_tpu.runtime import generate
from mlio_tpu.runtime.kv_cache import init_cache
from mlio_tpu.runtime.sampling import SamplingMethod


def _decode_steps(spec, params, n=3, cache_quant=None, B=2, CACHE=64,
                  tol=1e-4):
    cache = init_cache(spec, B, CACHE, dtype=jnp.float32, quant=cache_quant)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, 5), 0,
                             spec.vocab_size)
    logits, cache = forward(params, spec, ids, impl=Impl(
        attention="flash", decode_stack="scan"), cache=cache)
    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    c_ref, c_til = dict(cache), dict(cache)
    for _ in range(n):
        lr, c_ref = forward(params, spec, tok,
                            impl=Impl(attention="flash",
                                      decode_stack="scan"), cache=c_ref)
        lt, c_til = forward(params, spec, tok,
                            impl=Impl(attention="flash",
                                      decode_stack="tiled"), cache=c_til)
        np.testing.assert_allclose(np.asarray(lr, np.float32),
                                   np.asarray(lt, np.float32),
                                   rtol=tol, atol=tol)
        tok = jnp.argmax(lr[:, -1:], -1).astype(jnp.int32)
    return c_ref, c_til


@pytest.mark.parametrize("name", ["gpt2-tiny", "llama-tiny"])
def test_tiled_matches_scan_decode(name):
    spec = get_spec(name)
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    c_ref, c_til = _decode_steps(spec, params)
    np.testing.assert_allclose(
        np.asarray(c_ref["k"]),
        np.asarray(c_til["k"]).reshape(c_ref["k"].shape),
        rtol=1e-5, atol=1e-5)


def test_tiled_multiphase_with_edge_masking():
    """Force multi-group attention + multi-chunk MLP where the intermediate
    width does NOT divide the chunk: the edge chunk streams with a CLAMPED
    start (alignment-safe DMA) and its overlap columns — already covered by
    the previous chunk — must be masked to zero in-kernel."""
    spec = dataclasses.replace(get_spec("llama-tiny"), name="tile-test",
                               intermediate_size=384)  # 384 = 256 + 128
    params = init_params(spec, jax.random.PRNGKey(2), dtype=jnp.float32)
    B, CACHE = 2, 32
    cache = init_cache(spec, B, CACHE, dtype=jnp.float32)
    ids = jnp.asarray([[3, 1, 4], [1, 5, 9]], jnp.int32)
    _, cache = forward(params, spec, ids, impl=Impl(), cache=cache)
    tok = jnp.asarray([[2], [7]], jnp.int32)
    lr, c_ref = forward(params, spec, tok,
                        impl=Impl(attention="flash", decode_stack="scan"),
                        cache=dict(cache))

    flat_k = cache["k"].reshape(*cache["k"].shape[:3], -1)
    flat_v = cache["v"].reshape(*cache["v"].shape[:3], -1)
    # 2 attention groups (2 q heads / 1 kv head each) + 2 MLP chunks of
    # 256 (edge chunk 128 wide -> clamped start overlaps by 128 columns)
    tiling = Tiling(hg=2, ic=256, ka=2, km=2)
    x = params["tok_embed"][tok[:, 0]]
    from mlio_tpu.models.transformer import rope_cos_sin

    cos, sin = rope_cos_sin(jnp.asarray([[cache["pos"]]]), spec.rope_dim,
                            spec.rope_theta)
    out = decode_layer_tiled(
        x, params["blocks"], flat_k, flat_v, cache["pos"],
        cos[0], sin[0], spec=spec, tiling=tiling, interpret=True)
    # compare the raw hidden output against the scan path's cache write +
    # logits by recomputing: easiest oracle is the scan path's k cache row
    np.testing.assert_allclose(
        np.asarray(c_ref["k"][:, :, cache["pos"]]).reshape(
            out[1][:, :, cache["pos"]].shape),
        np.asarray(out[1][:, :, cache["pos"]]), rtol=1e-4, atol=1e-4)


def test_tiled_matches_scan_with_rope_and_gqa():
    spec = get_spec("llama-tiny")  # GQA: 4 q heads, 2 kv heads, RoPE
    assert spec.num_kv_heads < spec.num_heads
    params = init_params(spec, jax.random.PRNGKey(3), dtype=jnp.float32)
    _decode_steps(spec, params, n=2)


def test_tiled_int8_weights_match_scan():
    from mlio_tpu.runtime.quantization import quantize_params

    spec = get_spec("llama-tiny")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_params(params, spec, "int8")
    _decode_steps(spec, qparams, n=2)


def test_tiled_int8_kv_cache_matches_scan():
    spec = get_spec("llama-tiny")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    # int8 rounding boundaries can flip; allow quantization-noise tolerance.
    # INT8 KV requires a 128-aligned cache (scale-slab lane slicing).
    _decode_steps(spec, params, n=2, cache_quant="int8", CACHE=128, tol=2e-2)


def test_tiled_int8_kv_rejects_unaligned_cache():
    """Unaligned cache + int8 KV must raise the clear error (and the auto
    router must avoid the tiled path entirely for that shape)."""
    spec = get_spec("llama-tiny")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    assert not supports_decode_tiled(spec, B=2, cache_quant=True,
                                     blocks=params["blocks"], smax=64)
    with pytest.raises(ValueError, match="128-aligned"):
        _decode_steps(spec, params, n=1, cache_quant="int8", CACHE=64)


def test_generate_routes_big_model_through_tiled():
    """A model whose per-layer weights exceed the mega VMEM gate must route
    decode_stack='auto' through the tiled kernel inside generate()."""
    from mlio_tpu.ops.decode_layer import supports_decode_stack

    spec = dataclasses.replace(
        get_spec("llama-tiny"), name="midsize", hidden_size=2048,
        num_heads=16, num_kv_heads=16, intermediate_size=8192,
        num_layers=2, vocab_size=512)
    assert not supports_decode_stack(spec)
    assert supports_decode_tiled(spec, B=1)
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = jnp.asarray([[5, 3, 2, 6]], jnp.int32)
    out_scan = generate(params, spec, ids, max_new_tokens=4,
                        impl=Impl(attention="flash", decode_stack="scan"),
                        method=SamplingMethod(temperature=0.0))
    out_auto = generate(params, spec, ids, max_new_tokens=4,
                        impl=Impl(attention="flash"),
                        method=SamplingMethod(temperature=0.0))
    assert np.array_equal(np.asarray(out_scan), np.asarray(out_auto))


def test_generate_tiled_int8_kv_roundtrip():
    spec = get_spec("llama-tiny")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = jnp.asarray([[5, 3, 2, 6]], jnp.int32)
    out_scan = generate(params, spec, ids, max_new_tokens=5, cache_len=128,
                        impl=Impl(attention="flash", decode_stack="scan"),
                        cache_quant="int8",
                        method=SamplingMethod(temperature=0.0))
    out_tiled = generate(params, spec, ids, max_new_tokens=5, cache_len=128,
                         impl=Impl(attention="flash", decode_stack="tiled"),
                         cache_quant="int8",
                         method=SamplingMethod(temperature=0.0))
    agree = np.mean(np.asarray(out_scan) == np.asarray(out_tiled))
    assert agree >= 0.8, (out_scan, out_tiled)


def test_tiled_fp8_weights_match_scan():
    """fp8 weights through the tiled kernel use the integer bit-assembly
    dequant (ops.quant.fp8_to_bf16) — must agree with the scan path's
    XLA dequant to fp8-rounding tolerance."""
    from mlio_tpu.runtime.quantization import quantize_params

    spec = get_spec("llama-tiny")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_params(params, spec, "fp8")
    _decode_steps(spec, qparams, n=2, tol=2e-2)


def test_fp8_transcode_int8_serving_path():
    """transcode_fp8_to_int8 keeps generate() outputs close to the fp8
    master (both are ~1%-error quantizations of the same weights)."""
    from mlio_tpu.runtime.quantization import (
        quantize_params,
        transcode_fp8_to_int8,
    )

    spec = get_spec("llama-tiny")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    fp8 = quantize_params(params, spec, "fp8")
    tc = transcode_fp8_to_int8(fp8)
    assert tc["blocks"]["wq"].fmt == "int8"
    ids = jnp.asarray([[5, 3, 2, 6]], jnp.int32)
    a = generate(fp8, spec, ids, max_new_tokens=4, cache_len=128,
                 impl=Impl(attention="flash"),
                 method=SamplingMethod(temperature=0.0))
    b = generate(tc, spec, ids, max_new_tokens=4, cache_len=128,
                 impl=Impl(attention="flash"),
                 method=SamplingMethod(temperature=0.0))
    assert np.mean(np.asarray(a) == np.asarray(b)) >= 0.75


def test_tiled_moe_matches_scan_decode():
    """Fused MoE decode: the tiled kernel's in-kernel router (softmax ->
    top-k -> renormalize) + masked-dense expert streaming must agree with
    the per-op scan path (moe_mlp_ragged)."""
    spec = get_spec("moe-tiny")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    _decode_steps(spec, params, n=3, CACHE=128)


def test_tiled_moe_int8_weights_and_kv():
    from mlio_tpu.runtime.quantization import quantize_params

    spec = get_spec("moe-tiny")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_params(params, spec, "int8")
    _decode_steps(spec, qparams, n=2, CACHE=128, cache_quant="int8",
                  tol=3e-2)


def test_tiled_moe_generate_roundtrip():
    spec = get_spec("moe-tiny")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = jnp.asarray([[5, 3, 2, 6], [1, 2, 3, 4]], jnp.int32)
    out_scan = generate(params, spec, ids, max_new_tokens=5, cache_len=128,
                        impl=Impl(attention="flash", decode_stack="scan"),
                        method=SamplingMethod(temperature=0.0))
    out_tiled = generate(params, spec, ids, max_new_tokens=5, cache_len=128,
                         impl=Impl(attention="flash", decode_stack="tiled"),
                         method=SamplingMethod(temperature=0.0))
    assert np.mean(np.asarray(out_scan) == np.asarray(out_tiled)) >= 0.8


def test_supports_decode_tiled_moe_geometry():
    """The moe-13b bench geometry must qualify and pick whole-expert
    chunks (Km=1): 1 attention + E expert phases per layer."""
    spec = dataclasses.replace(
        get_spec("mixtral-8x7b"), name="moe-13b",
        hidden_size=2048, num_layers=24, num_heads=16, num_kv_heads=4,
        intermediate_size=5632, vocab_size=32000)
    t = choose_tiling(spec, 8, 1, 1)
    assert t is not None and t.km == 1 and t.ic == 5632


def test_supports_decode_tiled_gating():
    # 7B-class: mega cannot fit, tiled can (bf16 and int8)
    assert supports_decode_tiled(get_spec("llama2-7b"), B=8)
    assert supports_decode_tiled(get_spec("llama2-7b"), B=1,
                                 cache_quant=True)
    t = choose_tiling(get_spec("llama2-7b"), B=8, weight_itemsize=1)
    assert t is not None and t.ka * t.hg == 32
    assert t.ic % 128 == 0
    # parallel-residual families are out of scope
    assert not supports_decode_tiled(get_spec("neox-tiny"))
