"""70B-shard FP8 decode experiment (VERDICT r3 #2).

Same-process A/B of the Llama-70B tp16 per-chip shard (fp8 weights,
int8 KV, B=8):
  scan-fused : the round-3 bench configuration (fused projections ->
               per-op scan path)
  tiled      : unfused -> tiled megakernel, current fp8 VMEM reserve
  tiled-r1   : tiled with the fp8 spill reserve disabled (bigger chunks,
               fewer phases) — does Mosaic still compile, and is it faster?

Usage: python exp_fp8.py [legs...]
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def _marginal_step(run, n_lo, n_hi, reps=4):
    run(n_lo), run(n_hi)
    lows, highs = [], []
    for _ in range(reps):
        t0 = time.time(); run(n_lo); lows.append(time.time() - t0)
        t0 = time.time(); run(n_hi); highs.append(time.time() - t0)
    return (min(highs) - min(lows)) / (n_hi - n_lo)


def main():
    from mlio_tpu.models import Impl, get_spec
    from mlio_tpu.ops import decode_tiled
    from mlio_tpu.runtime import generate
    from mlio_tpu.runtime.quantization import (
        fuse_projections,
        init_quantized_params,
    )

    legs = sys.argv[1:] or ["scan-fused", "tiled", "tiled-r1"]
    spec = dataclasses.replace(
        get_spec("llama2-70b"), name="llama2-70b-tp16-shard",
        num_heads=4, num_kv_heads=1, intermediate_size=28672 // 16,
        head_dim=128)
    B, CACHE, PROMPT = 8, 1024, 704
    ids = jnp.zeros((B, PROMPT), jnp.int32)
    impl = Impl(attention="flash", norm="fused")

    params_unfused = init_quantized_params(spec, jax.random.PRNGKey(0),
                                           weights="fp8")

    h, i, l = spec.hidden_size, spec.intermediate_size, spec.num_layers
    proj = l * (h * spec.q_dim + 2 * h * spec.kv_dim + spec.q_dim * h
                + 3 * h * i)
    embed = 2 * spec.vocab_size * h * 2
    orig_choose = decode_tiled.choose_tiling

    def run_leg(name, params, n_lo, n_hi, patch_reserve=False):
        if patch_reserve:
            def choose_no_reserve(spec_, B_, wi=1, ci=2, **kw):
                kw.pop("weight_fmt", None)
                return orig_choose(spec_, B_, wi, ci, weight_fmt=None)
            decode_tiled.choose_tiling = choose_no_reserve
        try:
            t = orig_choose(spec, B, 1, 1,
                            weight_fmt=None if patch_reserve else "fp8")
            print(f"# {name}: tiling={t}", flush=True)

            def run(new):
                out = generate(params, spec, ids, max_new_tokens=new,
                               impl=impl, cache_len=CACHE,
                               cache_quant="int8")
                return int(out[0, -1])

            step = _marginal_step(run, n_lo, n_hi)
            avg_ctx = PROMPT + (n_lo + n_hi) // 2
            kv = B * 2 * l * avg_ctx * spec.kv_dim
            roof = (proj + embed + kv) / (819e9)
            print(f"{name}: step={step * 1e3:.2f} ms "
                  f"({B / step:.1f} tok/s/chip, {roof / step:.3f} of "
                  f"roofline)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
        finally:
            decode_tiled.choose_tiling = orig_choose

    for idx, leg in enumerate(legs):
        lo, hi = 32 - idx, 160 - idx  # distinct statics bust the jit cache
        if leg == "scan-fused":
            run_leg(leg, fuse_projections(params_unfused, spec), lo, hi)
        elif leg == "tiled":
            run_leg(leg, params_unfused, lo, hi)
        elif leg == "tiled-r1":
            run_leg(leg, params_unfused, lo, hi, patch_reserve=True)


if __name__ == "__main__":
    main()
