"""Decompose the fused decode step's non-kernel overhead on the real chip.

Each variant removes ONE XLA op around the megakernel while keeping the
token dependency chain intact (the kernel's emitted token feeds the next
step's embedding, so nothing can be DCE'd). Marginal method as bench.py.
"""
import functools
import time

import jax
import jax.numpy as jnp

from mlio_tpu.models import Impl, load_model
from mlio_tpu.models.transformer import forward
from mlio_tpu.ops.decode_layer import decode_layer_stack, pad_lm_head_for_mega
from mlio_tpu.runtime.kv_cache import init_cache

B, PROMPT, CACHE = 8, 704, 1024
LO, HI = 64, 320


def main():
    spec, params = load_model("gpt2", dtype=jnp.bfloat16)
    impl = Impl(attention="flash", norm="fused")
    ids = jnp.zeros((B, PROMPT), jnp.int32)
    lm_w, lm_V, lm_Vc = pad_lm_head_for_mega(params["tok_embed"], True)

    @functools.partial(jax.jit, static_argnames=("n", "mode"))
    def run(params, lm_w, ids, n, mode):
        cache = init_cache(spec, B, CACHE, dtype=jnp.bfloat16)
        logits, cache = forward(params, spec, ids, impl=impl, cache=cache)
        tok = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)
        ck = cache["k"].reshape(*cache["k"].shape[:3], -1)
        cv = cache["v"].reshape(*cache["v"].shape[:3], -1)

        def step(carry, _):
            ck, cv, pos, tok = carry
            if mode == "noembed":
                x = (jnp.zeros((B, spec.hidden_size), jnp.bfloat16)
                     + tok[:, None].astype(jnp.bfloat16) * 1e-6)
            else:
                x = params["tok_embed"][tok]
            if mode != "nopos":
                x = x + params["pos_embed"][pos].astype(x.dtype)
            out = decode_layer_stack(
                x, params["blocks"], ck, cv, pos, None, None, spec=spec,
                head_norm=(params["final_scale"], params["final_bias"]),
                lm_head=lm_w, lm_head_bias=None, lm_vmajor=True,
                vocab_chunk=lm_Vc, vocab_size=lm_V)
            if mode == "nocache":
                ck2, cv2 = ck, cv
            else:
                ck2, cv2 = out[1], out[2]
            tok = out[-1][:, 0]
            return (ck2, cv2, pos + 1, tok), ()

        (ck, cv, pos, tok), _ = jax.lax.scan(
            step, (ck, cv, cache["pos"], tok), None, length=n)
        return tok

    def marginal(mode, reps=3):
        def f(n):
            return int(run(params, lm_w, ids, n, mode)[0])
        f(LO), f(HI)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter(); f(LO); tl = time.perf_counter() - t0
            t0 = time.perf_counter(); f(HI); th = time.perf_counter() - t0
            best = min(best, (th - tl) / (HI - LO))
        return best * 1e3

    base = marginal("full")
    print(f"full    : {base:.3f} ms/step", flush=True)
    for mode in ("nopos", "noembed", "nocache"):
        ms = marginal(mode)
        print(f"{mode:8s}: {ms:.3f} ms/step  (saves {base - ms:+.3f})",
              flush=True)


if __name__ == "__main__":
    main()
