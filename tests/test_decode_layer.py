"""Decode megakernel (ops/decode_layer.py) vs the per-op scan decode path.

The megakernel runs every layer of a decode step in one pallas_call (grid ==
layer index, flat head layouts, constant head-structure matrices on the MXU).
These tests drive it in interpreter mode on the CPU mesh and require exact
agreement with the lax.scan per-op path across models covering LN/RMS norms,
biases, RoPE, GQA and gated MLPs.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlio_tpu.models import Impl, get_spec, init_params
from mlio_tpu.models.transformer import forward
from mlio_tpu.ops.decode_layer import (
    decode_vmem_bytes,
    supports_decode_stack,
)
from mlio_tpu.runtime import generate, greedy_generate
from mlio_tpu.runtime.kv_cache import init_cache
from mlio_tpu.runtime.sampling import SamplingMethod


@pytest.mark.parametrize("name", ["gpt2-tiny", "llama-tiny"])
def test_megakernel_matches_scan_decode(name):
    spec = get_spec(name)
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    B, CACHE = 4, 64
    cache = init_cache(spec, B, CACHE, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, 7), 0,
                             spec.vocab_size)
    logits, cache = forward(params, spec, ids, impl=Impl(), cache=cache)
    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)

    c_ref, c_mega = dict(cache), dict(cache)
    t_ref = t_mega = tok
    for _ in range(4):
        lr, c_ref = forward(params, spec, t_ref,
                            impl=Impl(attention="flash",
                                      decode_stack="scan"), cache=c_ref)
        lm, c_mega = forward(params, spec, t_mega,
                             impl=Impl(attention="flash",
                                       decode_stack="mega"), cache=c_mega)
        np.testing.assert_allclose(np.asarray(lr, np.float32),
                                   np.asarray(lm, np.float32),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(c_ref["k"]),
                                   np.asarray(c_mega["k"]).reshape(
                                       c_ref["k"].shape),
                                   rtol=1e-5, atol=1e-5)
        t_ref = jnp.argmax(lr[:, -1:], -1).astype(jnp.int32)
        t_mega = jnp.argmax(lm[:, -1:], -1).astype(jnp.int32)
        assert jnp.array_equal(t_ref, t_mega)


def test_megakernel_flat_cache_roundtrip():
    """A flat [L,B,S,Hkv*D] cache is accepted and stays flat in the output
    (generate's carry layout); a 5D cache round-trips to 5D."""
    spec = get_spec("llama-tiny")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    B, CACHE = 2, 32
    cache = init_cache(spec, B, CACHE, dtype=jnp.float32)
    ids = jnp.asarray([[3, 1, 4], [1, 5, 9]], jnp.int32)
    _, cache = forward(params, spec, ids, impl=Impl(), cache=cache)
    tok = jnp.asarray([[2], [7]], jnp.int32)
    impl = Impl(attention="flash", decode_stack="mega")

    l5, c5 = forward(params, spec, tok, impl=impl, cache=dict(cache))
    assert c5["k"].ndim == 5

    flat = dict(cache)
    flat["k"] = cache["k"].reshape(*cache["k"].shape[:3], -1)
    flat["v"] = cache["v"].reshape(*cache["v"].shape[:3], -1)
    lf, cf = forward(params, spec, tok, impl=impl, cache=flat)
    assert cf["k"].ndim == 4
    np.testing.assert_allclose(np.asarray(l5, np.float32),
                               np.asarray(lf, np.float32),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c5["k"]).reshape(cf["k"].shape),
                               np.asarray(cf["k"]), rtol=1e-6, atol=1e-6)


def test_generate_auto_routes_through_megakernel():
    """decode_stack='auto' (the default) must produce the same greedy tokens
    as the explicit scan path through the full generate loop."""
    spec = get_spec("gpt2-tiny")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = jnp.asarray([[5, 3, 2, 6], [1, 2, 3, 4]], jnp.int32)
    out_scan = greedy_generate(params, spec, ids, max_new_tokens=6,
                               impl=Impl(attention="flash",
                                         decode_stack="scan"))
    out_auto = greedy_generate(params, spec, ids, max_new_tokens=6,
                               impl=Impl(attention="flash"))
    assert np.array_equal(np.asarray(out_scan), np.asarray(out_auto))


def test_supports_decode_stack_gating():
    assert supports_decode_stack(get_spec("gpt2-tiny"))
    assert supports_decode_stack(get_spec("llama-tiny"))
    # int8 KV cache is handled by the megakernel (fused dequant)
    assert supports_decode_stack(get_spec("gpt2-tiny"), cache_quant=True)
    # parallel-residual families are out of scope for the megakernel
    assert not supports_decode_stack(get_spec("neox-tiny"))
    # VMEM gate: a 7B-class model's per-layer weights cannot fit
    assert not supports_decode_stack(get_spec("llama2-7b"))
    assert decode_vmem_bytes(get_spec("llama2-7b"), 8, 128) > (100 << 20)


@pytest.mark.parametrize("name", ["gpt2-tiny", "llama-tiny"])
def test_megakernel_int8_weights_match_scan(name):
    """INT8 QTensor weights: the megakernel's fused dequant must agree with
    the scan path's quant_matmul to float tolerance."""
    from mlio_tpu.runtime.quantization import quantize_params

    spec = get_spec(name)
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_params(params, spec, "int8")
    B, CACHE = 4, 64
    cache = init_cache(spec, B, CACHE, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, 7), 0,
                             spec.vocab_size)
    logits, cache = forward(qparams, spec, ids, impl=Impl(), cache=cache)
    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    c_ref, c_mega = dict(cache), dict(cache)
    for _ in range(3):
        lr, c_ref = forward(qparams, spec, tok,
                            impl=Impl(attention="flash",
                                      decode_stack="scan"), cache=c_ref)
        lm, c_mega = forward(qparams, spec, tok,
                             impl=Impl(attention="flash",
                                       decode_stack="mega"), cache=c_mega)
        np.testing.assert_allclose(np.asarray(lr, np.float32),
                                   np.asarray(lm, np.float32),
                                   rtol=1e-4, atol=1e-4)
        tok = jnp.argmax(lr[:, -1:], -1).astype(jnp.int32)


def test_supports_decode_stack_int8_widens_vmem():
    """int8 weights halve the streamed bytes, so models that miss the VMEM
    gate in bf16 can still take the megakernel when quantized."""
    from mlio_tpu.ops.quant import QTensor

    spec = get_spec("gpt2-tiny")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    from mlio_tpu.runtime.quantization import quantize_params

    q = quantize_params(params, spec, "int8")
    assert isinstance(q["blocks"]["wq"], QTensor)
    assert supports_decode_stack(spec, blocks=q["blocks"])
    # int4 is not handled by the kernel -> falls back to scan
    q4 = quantize_params(params, spec, "int4")
    assert not supports_decode_stack(spec, blocks=q4["blocks"])


@pytest.mark.parametrize("name", ["gpt2-tiny", "llama-tiny"])
def test_megakernel_int8_kv_cache_matches_scan(name):
    """INT8 KV cache through the megakernel: in-kernel per-head quantization
    must write the same ints/scales as quantize_kv, and the fused dequant
    must track the scan path to quantization-noise tolerance (RoPE op-order
    differences can flip an int8 rounding boundary)."""
    spec = get_spec(name)
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    # INT8 KV requires a 128-aligned cache (scale-slab lane slicing)
    B, CACHE = 4, 128
    cache = init_cache(spec, B, CACHE, dtype=jnp.float32, quant="int8")
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, 7), 0,
                             spec.vocab_size)
    logits, cache = forward(params, spec, ids,
                            impl=Impl(attention="flash",
                                      decode_stack="scan"), cache=cache)
    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    c_ref, c_mega = dict(cache), dict(cache)
    for _ in range(3):
        lr, c_ref = forward(params, spec, tok,
                            impl=Impl(attention="flash",
                                      decode_stack="scan"), cache=c_ref)
        lm, c_mega = forward(params, spec, tok,
                             impl=Impl(attention="flash",
                                       decode_stack="mega"), cache=c_mega)
        d = float(jnp.max(jnp.abs(lr.astype(jnp.float32)
                                  - lm.astype(jnp.float32))))
        dk = int(jnp.max(jnp.abs(c_ref["k"].astype(jnp.int32)
                                 - c_mega["k"].astype(jnp.int32))))
        ds = float(jnp.max(jnp.abs(c_ref["k_scale"] - c_mega["k_scale"])))
        assert d < 2e-2 and dk <= 1 and ds < 1e-4, (d, dk, ds)
        tok = jnp.argmax(lr[:, -1:], -1).astype(jnp.int32)


def test_generate_int8_kv_mega_routes_and_runs():
    """generate() with cache_quant=int8: the auto path converts the scale
    caches to the mega layout at the boundary and decodes correctly."""
    from mlio_tpu.runtime import greedy_generate as _gg

    spec = get_spec("llama-tiny")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = jnp.asarray([[5, 3, 2, 6]], jnp.int32)
    out_scan = generate(params, spec, ids, max_new_tokens=5, cache_len=128,
                        impl=Impl(attention="flash", decode_stack="scan"),
                        cache_quant="int8",
                        method=SamplingMethod(temperature=0.0))
    out_mega = generate(params, spec, ids, max_new_tokens=5, cache_len=128,
                        impl=Impl(attention="flash", decode_stack="mega"),
                        cache_quant="int8",
                        method=SamplingMethod(temperature=0.0))
    # greedy tokens may flip at int8 rounding boundaries; demand >= 4/5 agree
    agree = np.mean(np.asarray(out_scan) == np.asarray(out_mega))
    assert agree >= 0.8, (out_scan, out_mega)


def test_generate_with_sampling_runs_mega():
    """Non-greedy sampling through the mega path stays shape/finite-sane."""
    spec = get_spec("llama-tiny")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = jnp.asarray([[5, 3, 2]], jnp.int32)
    out = generate(params, spec, ids, max_new_tokens=5,
                   impl=Impl(attention="flash", decode_stack="mega"),
                   method=SamplingMethod(temperature=0.8, top_k=5),
                   rng=jax.random.PRNGKey(7))
    assert out.shape == (1, 8)
    assert int(out.max()) < spec.vocab_size
