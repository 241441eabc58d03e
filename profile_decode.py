"""Decompose the headline GPT-2 decode step on the real chip.

Uses the REAL generate path (immune to DCE) and the two-length marginal.
Sweeping context and batch separates the step into:
  t_step(B, ctx) = t_fixed(weights + epilogue + launches) + B*ctx*c_kv
so the ctx slope gives the effective KV bandwidth and the extrapolated
intercept gives the weights+overhead time.
"""
import time

import jax
import jax.numpy as jnp

from mlio_tpu.models import Impl, load_model
from mlio_tpu.runtime import generate

CACHE = 1024
LO, HI = 64, 320


def marginal(params, spec, impl, B, prompt, reps=3):
    ids = jnp.zeros((B, prompt), jnp.int32)

    def run(new):
        out = generate(params, spec, ids, max_new_tokens=new, impl=impl,
                       cache_len=CACHE)
        return int(out[0, -1])

    run(LO), run(HI)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); run(LO); tl = time.perf_counter() - t0
        t0 = time.perf_counter(); run(HI); th = time.perf_counter() - t0
        best = min(best, (th - tl) / (HI - LO))
    return best * 1e3


def main():
    spec, params = load_model("gpt2", dtype=jnp.bfloat16)
    impl = Impl(attention="flash", norm="fused")
    pts = []
    for B, prompt in ((8, 704), (8, 384), (8, 128), (2, 704)):
        ms = marginal(params, spec, impl, B, prompt)
        avg_ctx = prompt + (LO + HI) // 2
        pts.append((B, avg_ctx, ms))
        print(f"B={B} prompt={prompt} avg_ctx={avg_ctx}: {ms:.3f} ms/step",
              flush=True)

    # fit ctx slope at B=8
    b8 = [(c, t) for B, c, t in pts if B == 8]
    (c1, t1), (c3, t3) = b8[0], b8[-1]
    slope = (t1 - t3) / (c1 - c3)  # ms per ctx token (B=8)
    kv_bytes_per_tok = 8 * 2 * spec.num_layers * spec.kv_dim * 2
    bw = kv_bytes_per_tok / (slope * 1e-3) / 1e9
    t_fixed = t1 - slope * c1
    print(f"KV slope: {slope*1e3:.3f} us/ctx-token -> {bw:.0f} GB/s effective"
          f" KV bandwidth", flush=True)
    print(f"extrapolated fixed time (weights+epilogue+launch): "
          f"{t_fixed:.3f} ms", flush=True)
    wbytes = spec.num_params() * 2
    print(f"weights-only roofline at 819 GB/s: {wbytes/819e9*1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
