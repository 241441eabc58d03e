"""Decompose the headline GPT-2 decode step on the real chip.

Each variant runs the decode scan with a piece removed; the two-length
marginal (T(hi)-T(lo))/(hi-lo) cancels dispatch/prefill. Differences
between variants localize the non-roofline time in bench.py's 0.867 ms step.
"""
import functools
import time

import jax
import jax.numpy as jnp

from mlio_tpu.models import Impl, load_model
from mlio_tpu.ops.decode_layer import decode_layer_stack
from mlio_tpu.runtime.kv_cache import init_cache

B, PROMPT, CACHE = 8, 704, 1024
LO, HI = 64, 320


def marginal(fn, lo=LO, hi=HI, reps=3):
    fn(lo), fn(hi)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); fn(lo); t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); fn(hi); t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (hi - lo))
    return best * 1e3


def main():
    spec, params = load_model("gpt2", dtype=jnp.bfloat16)
    impl = Impl(attention="flash", norm="fused")
    from mlio_tpu.models.transformer import forward
    from mlio_tpu.runtime import sampling

    ids = jnp.zeros((B, PROMPT), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("n", "mode"))
    def run(params, ids, n, mode):
        cache = init_cache(spec, B, CACHE, dtype=jnp.bfloat16)
        logits, cache = forward(params, spec, ids, impl=impl, cache=cache)
        tok = jnp.argmax(logits[:, -1, :], -1)
        cache = dict(cache)
        cache["k"] = cache["k"].reshape(*cache["k"].shape[:3], -1)
        cache["v"] = cache["v"].reshape(*cache["v"].shape[:3], -1)

        def step(carry, _):
            cache, tok = carry
            if mode == "full":
                logits, cache = forward(params, spec, tok[:, None],
                                        impl=impl, cache=cache)
                tok = jnp.argmax(logits[:, -1, :], -1)
            elif mode == "nologits":
                # megakernel + cache update only; token fixed
                x = params["tok_embed"][tok[:, None]]
                x = x + params["pos_embed"][cache["pos"]][None, None]
                h, ck, cv = decode_layer_stack(
                    x[:, 0], params["blocks"], cache["k"], cache["v"],
                    cache["pos"], None, None, spec=spec)[:3]
                cache = {"k": ck, "v": cv, "pos": cache["pos"] + 1}
                tok, _ = jax.lax.optimization_barrier((tok, h))
            elif mode == "nosample":
                # full forward but token fixed (lm_head still computed)
                logits, cache = forward(params, spec, tok[:, None],
                                        impl=impl, cache=cache)
                tok, _ = jax.lax.optimization_barrier((tok, logits))
            return (cache, tok), ()

        (cache, tok), _ = jax.lax.scan(step, (cache, tok), None, length=n)
        tok, _ = jax.lax.optimization_barrier((tok, cache["k"]))
        return tok

    for mode in ("full", "nosample", "nologits"):
        def f(n, mode=mode):
            return int(run(params, ids, n, mode)[0])
        ms = marginal(f)
        print(f"{mode:10s}: {ms:.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
