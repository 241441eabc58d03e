"""Decompose the 7B tiled-decode step: kernel vs epilogue (lm_head etc).

Variants (marginal-method timing, B=8, llama2-7b INT8 weights + INT8 KV):
  full      — shipping step: embed + rope + tiled kernel + norm + lm_head
              + argmax (the bench_extra llama7b-int8 config)
  nohead    — lm_head replaced by an argmax over the hidden state (keeps
              the token dependency chain; removes the 131MB head read +
              its launch)
  kernelonly— nohead minus embedding gather/rope (x synthesized from tok)

The deltas localize the ~1.6ms-over-roofline residual: full-nohead is the
epilogue cost; nohead-kernelonly is the embed/rope cost; kernelonly vs
the 11.2ms stream floor is in-kernel bubble.
"""
import functools
import time

import jax
import jax.numpy as jnp

from mlio_tpu.models import Impl, get_spec
from mlio_tpu.models.transformer import forward, rope_cos_sin
from mlio_tpu.ops.decode_tiled import (
    decode_layer_tiled,
    pad_scales_for_tiled,
    resolve_tiling,
)
from mlio_tpu.runtime.kv_cache import init_cache
from mlio_tpu.runtime.quantization import init_quantized_params

B, PROMPT, CACHE = 8, 704, 1024
LO, HI = 16, 64


def main():
    spec = get_spec("llama2-7b")
    params = init_quantized_params(spec, jax.random.PRNGKey(0),
                                   quantize_lm_head=True)
    impl = Impl(attention="flash", norm="fused")
    ids = jnp.zeros((B, PROMPT), jnp.int32)
    tiling = resolve_tiling(spec, B, 1, 1, weight_fmt="int8",
                            cache_len=CACHE, quant=True)
    from mlio_tpu.ops.autotune import lookup_key, tiled_decode_key
    tuned = lookup_key(tiled_decode_key(spec.hidden_size, spec.kv_dim, B,
                                        CACHE, True)) or {}
    cb, kd = tuned.get("cache_block"), tuned.get("kv_depth")
    print(f"tiling={tiling} cb={cb} kd={kd}")

    @functools.partial(jax.jit, static_argnames=("n", "mode"))
    def run(params, ids, n, mode):
        cache = init_cache(spec, B, CACHE, dtype=jnp.bfloat16, quant="int8")
        logits, cache = forward(params, spec, ids, impl=impl, cache=cache)
        tok = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)
        ck = cache["k"].reshape(*cache["k"].shape[:3], -1)
        cv = cache["v"].reshape(*cache["v"].shape[:3], -1)
        ks = pad_scales_for_tiled(cache["k_scale"], spec.num_kv_heads,
                                  tiling.ka)
        vs = pad_scales_for_tiled(cache["v_scale"], spec.num_kv_heads,
                                  tiling.ka)

        def step(carry, _):
            ck, cv, ks, vs, pos, tok = carry
            if mode == "kernelonly":
                x = (jnp.zeros((B, spec.hidden_size), jnp.bfloat16)
                     + tok[:, None].astype(jnp.bfloat16) * 1e-6)
            else:
                x = params["tok_embed"][tok]
            cs, sn = rope_cos_sin(jnp.reshape(pos, (1,)), spec.rope_dim,
                                  spec.rope_theta, jnp.float32)
            out = decode_layer_tiled(
                x, params["blocks"], ck, cv, pos, cs, sn,
                spec=spec, k_scales=ks, v_scales=vs, tiling=tiling,
                cache_block=cb, kv_depth=kd)
            h = out[0]
            if mode == "full":
                from mlio_tpu import ops as _ops
                hn = _ops.norm(h[:, None], params["final_scale"],
                               params["final_bias"], kind=spec.norm,
                               eps=spec.norm_eps)
                lg = _ops.linear(hn, params["lm_head"])
                tok = jnp.argmax(lg[:, 0], -1).astype(jnp.int32)
            else:
                tok = jnp.argmax(h, -1).astype(jnp.int32)
            return (out[1], out[2], out[3], out[4], pos + 1, tok), ()

        (ck, cv, ks, vs, pos, tok), _ = jax.lax.scan(
            step, (ck, cv, ks, vs, cache["pos"], tok), None, length=n)
        return tok

    for mode in ("full", "nohead", "kernelonly"):
        def f(n):
            return int(run(params, ids, n, mode)[0])
        f(LO), f(HI)
        dt = float("inf")
        for _ in range(4):
            t0 = time.perf_counter(); f(LO); tl = time.perf_counter() - t0
            t0 = time.perf_counter(); f(HI); th = time.perf_counter() - t0
            dt = min(dt, (th - tl) / (HI - LO))
        print(f"{mode:10s}: {dt * 1e3:8.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
