"""Fused greedy epilogue in the decode megakernel (ops/decode_layer.py).

The epilogue streams lm_head chunks as extra grid steps with a running
(max, argmax) in scratch and emits next-token ids directly — final norm,
the logits matmul, and argmax never become XLA ops. These tests force
multi-chunk streaming (vocab_chunk < V), both lm_head layouts (tied
vocab-major / untied hidden-major), head bias, and the int8-KV path, and
demand the emitted tokens equal XLA's argmax over the reference logits.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlio_tpu.models import Impl, get_spec, init_params
from mlio_tpu.models.transformer import forward
from mlio_tpu.ops.decode_layer import decode_layer_stack
from mlio_tpu.runtime import greedy_generate
from mlio_tpu.runtime.kv_cache import init_cache


def _setup(name, B=4, cache_len=64, prompt=7):
    spec = get_spec(name)
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    cache = init_cache(spec, B, cache_len, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, prompt), 0,
                             spec.vocab_size)
    logits, cache = forward(params, spec, ids, impl=Impl(), cache=cache)
    tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    flat = dict(cache)
    flat["k"] = cache["k"].reshape(*cache["k"].shape[:3], -1)
    flat["v"] = cache["v"].reshape(*cache["v"].shape[:3], -1)
    return spec, params, flat, tok


@pytest.mark.parametrize("name,vc", [("gpt2-tiny", 128), ("llama-tiny", 128),
                                     ("gpt2-tiny", None)])
def test_fused_epilogue_matches_xla_argmax(name, vc):
    spec, params, cache, tok = _setup(name)
    x = params["tok_embed"][tok]
    pos = cache["pos"]
    if spec.positional == "learned":
        x = x + params["pos_embed"][pos].astype(x.dtype)
        cs = sn = None
    else:
        from mlio_tpu.models.transformer import rope_cos_sin
        cs, sn = rope_cos_sin(jnp.reshape(pos, (1,)), spec.rope_dim,
                              spec.rope_theta, jnp.float32)
    lm_w = (params["lm_head"] if params["lm_head"] is not None
            else params["tok_embed"])
    out = decode_layer_stack(
        x, params["blocks"], cache["k"], cache["v"], pos, cs, sn, spec=spec,
        interpret=True,
        head_norm=(params["final_scale"], params["final_bias"]),
        lm_head=lm_w, lm_head_bias=params.get("lm_head_bias"),
        lm_vmajor=params["lm_head"] is None, vocab_chunk=vc)
    fused_tok = out[-1][:, 0]
    # broadcast across all 128 lanes
    assert np.all(np.asarray(out[-1]) == np.asarray(out[-1][:, :1]))
    # reference: per-op forward then XLA argmax over the logits
    ref_logits, _ = forward(params, spec, tok[:, None], impl=Impl(),
                            cache=dict(cache, k=cache["k"].reshape(
                                *cache["k"].shape[:3],
                                spec.num_kv_heads, -1),
                                v=cache["v"].reshape(
                                *cache["v"].shape[:3],
                                spec.num_kv_heads, -1)))
    ref_tok = jnp.argmax(ref_logits[:, -1], -1)
    assert np.array_equal(np.asarray(fused_tok), np.asarray(ref_tok))


def test_fused_epilogue_head_bias():
    """An lm_head bias shifts the argmax; the epilogue must apply it."""
    spec, params, cache, tok = _setup("gpt2-tiny")
    rng = jax.random.PRNGKey(3)
    bias = jax.random.normal(rng, (spec.vocab_size,), jnp.float32) * 5.0
    params = dict(params, lm_head_bias=bias)
    x = params["tok_embed"][tok] + params["pos_embed"][cache["pos"]]
    out = decode_layer_stack(
        x, params["blocks"], cache["k"], cache["v"], cache["pos"], None,
        None, spec=spec, interpret=True,
        head_norm=(params["final_scale"], params["final_bias"]),
        lm_head=params["tok_embed"], lm_head_bias=bias, lm_vmajor=True,
        vocab_chunk=128)
    h = out[0]
    logits = h @ params["tok_embed"].T + bias
    assert np.array_equal(np.asarray(out[-1][:, 0]),
                          np.asarray(jnp.argmax(logits, -1)))


def test_generate_greedy_fused_equals_scan_path():
    """greedy_generate through the fused-epilogue mega path must produce the
    same tokens as the per-op scan path (whole pipeline, multiple steps)."""
    for name in ("gpt2-tiny", "llama-tiny"):
        spec = get_spec(name)
        params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
        ids = jax.random.randint(jax.random.PRNGKey(2), (2, 5), 0,
                                 spec.vocab_size, jnp.int32)
        out_scan = greedy_generate(params, spec, ids, max_new_tokens=6,
                                   impl=Impl(attention="flash",
                                             decode_stack="scan"))
        out_fused = greedy_generate(params, spec, ids, max_new_tokens=6,
                                    impl=Impl(attention="flash",
                                              decode_stack="mega"))
        assert np.array_equal(np.asarray(out_scan), np.asarray(out_fused)), \
            name


def test_combined_inplace_cache_and_pos_embed_match_split():
    """The combined k|v cache (in-place aliased write + in-kernel learned
    pos-embed) matches the split-cache path exactly — the shipping GPT-2
    config (kv_dim % 128 == 0) exercised in interpret mode on CPU
    (round 3: these were the MLIO_DECODE_EXTRAS features, now default-on)."""
    import dataclasses

    from mlio_tpu.models import get_spec, init_params
    from mlio_tpu.models.transformer import forward
    from mlio_tpu.ops.decode_layer import (
        decode_layer_stack,
        pad_lm_head_for_mega,
    )
    from mlio_tpu.runtime.kv_cache import init_cache

    spec = dataclasses.replace(get_spec("gpt2-tiny"), name="gpt2-kv128",
                               hidden_size=128, num_heads=2,
                               num_kv_heads=2, intermediate_size=256)
    assert spec.kv_dim == 128 and spec.max_seq_len % 8 == 0
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    B, CACHE, P = 2, 32, 11  # P % 8 != 0: slab straddles the prefill edge
    cache = init_cache(spec, B, CACHE, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, P), 0,
                             spec.vocab_size)
    _, cache = forward(params, spec, ids, impl=Impl(), cache=cache)
    ck = cache["k"].reshape(*cache["k"].shape[:3], -1)
    cv = cache["v"].reshape(*cache["v"].shape[:3], -1)
    lm_w, lm_V, lm_Vc = pad_lm_head_for_mega(params["tok_embed"], True, 128)
    pos = cache["pos"]
    x = params["tok_embed"][jnp.array([3, 5])]
    x_pe = x + params["pos_embed"][pos].astype(x.dtype)
    kw = dict(spec=spec, head_norm=(params["final_scale"],
                                    params["final_bias"]),
              lm_head=lm_w, lm_vmajor=True, vocab_chunk=lm_Vc,
              vocab_size=lm_V, interpret=True)

    o_split = decode_layer_stack(x_pe, params["blocks"], ck, cv, pos,
                                 None, None, **kw)
    ckv = jnp.concatenate([ck, cv], axis=-1)
    o_comb = decode_layer_stack(x, params["blocks"], ckv, None, pos,
                                None, None, kv_combined=True,
                                pos_embed=params["pos_embed"], **kw)
    np.testing.assert_allclose(np.asarray(o_split[0]), np.asarray(o_comb[0]),
                               rtol=1e-5, atol=1e-5)
    assert jnp.array_equal(o_split[-1][:, 0], o_comb[-1][:, 0])
    # in-place write: k|v lanes of the aliased cache match the split caches
    kc2 = o_comb[1][:, :, :, :spec.kv_dim]
    vc2 = o_comb[1][:, :, :, spec.kv_dim:]
    np.testing.assert_allclose(np.asarray(o_split[1][:, :, :pos + 1]),
                               np.asarray(kc2[:, :, :pos + 1]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_split[2][:, :, :pos + 1]),
                               np.asarray(vc2[:, :, :pos + 1]),
                               rtol=1e-5, atol=1e-5)
