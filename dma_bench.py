"""In-kernel DMA ceiling microbenchmark (VERDICT r3 #3).

Question: is the megakernel's ~650-750 GB/s effective HBM streaming a
physics ceiling for Pallas manual DMA, or an engineering gap vs XLA's own
ops (measured 819-969 GB/s on this chip)?

Method: stream the SAME ~2 GB weight-like slab through
  * xla-gemv   — one big [8, K] @ [K, N] dot (XLA's decode weight stream)
  * xla-scale  — whole-slab elementwise read+write (XLA copy stream)
  * pallas-auto — auto-pipelined BlockSpec operand fetch
  * pallas-d2/d3/d4 — manual async_copy with 2/3/4-deep buffering
  * pallas-dual — two interleaved DMA streams (separate semaphores)
over a sweep of chunk sizes, all in ONE process (cross-process variance on
this chip is ±5-9%, so only same-process A/B is meaningful), timed with the
two-length in-jit scan marginal (carry-dependent input so XLA cannot hoist
the loop body; scalar output fetch so the device actually syncs).

Usage: python dma_bench.py [--gb 2] [--chunks 4,16,32] [--depths 2,3,4]
Prints one line per variant: effective GB/s.
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _marginal(run, est_iter_s, reps=3):
    """Per-iteration seconds: (T(hi) - T(lo)) / (hi - lo), min over reps."""
    lo = 4
    hi = lo + max(8, min(512, int(0.4 / max(est_iter_s, 1e-5))))
    f_lo, f_hi = run(lo), run(hi)
    f_lo(), f_hi()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); f_lo(); tl = time.perf_counter() - t0
        t0 = time.perf_counter(); f_hi(); th = time.perf_counter() - t0
        m = (th - tl) / (hi - lo)
        if m > 0:
            best = min(best, m)
    return best


def _scan_harness(step_fn, *arrays):
    """Wrap a carry->scalar step into an n-iteration jitted scan. Arrays are
    passed as jit ARGUMENTS (a closed-over 2 GB slab would be captured as a
    lowering constant: minutes of lowering + a second device copy)."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(n, *arrs):
        def body(c, _):
            return step_fn(c, *arrs), ()

        out, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return out

    def make(n):
        return lambda: float(run_n(n, *arrays))

    return make


# ---------------------------------------------------------------------------
# XLA reference streams


def xla_gemv(total_bytes):
    K = 8192
    N = total_bytes // (K * 2) // 128 * 128
    w = jnp.ones((K, N), jnp.bfloat16)
    x0 = jnp.ones((8, K), jnp.bfloat16)

    def step(c, x0, w):
        x = x0 + c.astype(jnp.bfloat16)  # carry-dependent: no hoisting
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return jnp.sum(y) * 1e-30  # consume EVERY lane (else XLA drops cols)

    bytes_per = K * N * 2
    dt = _marginal(_scan_harness(step, x0, w), bytes_per / 800e9)
    return bytes_per / dt / 1e9


def xla_scale(total_bytes):
    R = total_bytes // (2 * 65536)
    a = jnp.ones((R, 65536), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(n, a):
        def body(c, _):
            return c * jnp.bfloat16(1.000001) + a * jnp.bfloat16(1e-30), ()

        out, _ = lax.scan(body, jnp.zeros_like(a), None, length=n)
        return jnp.sum(out[:8, :128].astype(jnp.float32))

    def make(n):
        return lambda: float(run_n(n, a))

    bytes_per = a.size * 2 * 3  # read a + read c + write c
    dt = _marginal(make, bytes_per / 800e9)
    return bytes_per / dt / 1e9


# ---------------------------------------------------------------------------
# Pallas streams


def _auto_kernel(x_ref, w_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += w_ref[0, :8, :128].astype(jnp.float32) + x_ref[0, 0]


def pallas_auto(total_bytes, chunk_mb):
    R = 512
    C = chunk_mb << 20 >> 10  # R*C*2 = chunk_mb MB
    n = max(1, total_bytes // (R * C * 2))
    w = jnp.ones((n, R, C), jnp.bfloat16)

    fn = pl.pallas_call(
        _auto_kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, R, C), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 << 20),
    )

    def step(c, w):
        y = fn(c.reshape(1, 1), w)
        return jnp.sum(y) * 1e-20

    bytes_per = n * R * C * 2
    dt = _marginal(_scan_harness(step, w), bytes_per / 700e9)
    return bytes_per / dt / 1e9


def _manual_kernel(x_ref, w_ref, o_ref, buf, sem, *, n, depth, streams):
    def cp(i, q):
        # q selects the stream's semaphore bank; slots rotate within a bank
        slot = lax.rem(i // streams, depth)
        return pltpu.make_async_copy(w_ref.at[i], buf.at[q, slot],
                                     sem.at[q, slot])

    # prewarm: depth-1 fetches in flight per stream
    for d in range((depth - 1) * streams):
        @pl.when(d < n)
        def _(d=d):
            cp(d, d % streams).start()

    def body(i, acc):
        q = lax.rem(i, streams)
        slot = lax.rem(i // streams, depth)
        cp(i, q).wait()
        acc = acc + buf[q, slot, :8, :128].astype(jnp.float32)
        nxt = i + (depth - 1) * streams

        @pl.when(nxt < n)
        def _():
            cp(nxt, lax.rem(nxt, streams)).start()

        return acc

    acc = lax.fori_loop(0, n, body, jnp.zeros((8, 128), jnp.float32))
    o_ref[...] = acc + x_ref[0, 0]


def pallas_manual(total_bytes, chunk_mb, depth=2, streams=1):
    R = 512
    C = chunk_mb << 20 >> 10
    n = max(depth * streams, total_bytes // (R * C * 2))
    if streams * depth * R * C * 2 > 110 << 20:
        return None  # buffers exceed VMEM
    w = jnp.ones((n, R, C), jnp.bfloat16)

    fn = pl.pallas_call(
        functools.partial(_manual_kernel, n=n, depth=depth, streams=streams),
        in_specs=[pl.BlockSpec((1, 1), lambda: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((streams, depth, R, C), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((streams, depth))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=126 << 20),
    )

    def step(c, w):
        y = fn(c.reshape(1, 1), w)
        return jnp.sum(y) * 1e-20

    bytes_per = n * R * C * 2
    dt = _marginal(_scan_harness(step, w), bytes_per / 700e9)
    return bytes_per / dt / 1e9


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gb", type=float, default=2.0)
    p.add_argument("--chunks", default="2,8,16,32")
    p.add_argument("--depths", default="2,3,4")
    p.add_argument("--skip-xla", action="store_true")
    args = p.parse_args()
    total = int(args.gb * (1 << 30))
    chunks = [int(c) for c in args.chunks.split(",")]
    depths = [int(d) for d in args.depths.split(",")]

    print(f"# backend={jax.default_backend()} slab={args.gb} GB", flush=True)
    if not args.skip_xla:
        print(f"xla-gemv              : {xla_gemv(total):7.1f} GB/s",
              flush=True)
        print(f"xla-scale (r+w)       : {xla_scale(total):7.1f} GB/s",
              flush=True)
    for c in chunks:
        try:
            g = pallas_auto(total, c)
            print(f"pallas-auto  chunk={c:3d}M: {g:7.1f} GB/s", flush=True)
        except Exception as e:
            print(f"pallas-auto  chunk={c:3d}M: failed "
                  f"{type(e).__name__}", flush=True)
        for d in depths:
            try:
                g = pallas_manual(total, c, depth=d)
                if g is not None:
                    print(f"pallas-d{d}    chunk={c:3d}M: {g:7.1f} GB/s",
                          flush=True)
            except Exception as e:
                print(f"pallas-d{d}    chunk={c:3d}M: failed "
                      f"{type(e).__name__}", flush=True)
        try:
            g = pallas_manual(total, c, depth=2, streams=2)
            if g is not None:
                print(f"pallas-dual  chunk={c:3d}M: {g:7.1f} GB/s",
                      flush=True)
        except Exception as e:
            print(f"pallas-dual  chunk={c:3d}M: failed {type(e).__name__}",
                  flush=True)


if __name__ == "__main__":
    main()
