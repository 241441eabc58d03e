"""Standalone cost of fp8->bf16 dequant inside a Pallas kernel on v5e.

Streams a 1 GB weight slab chunk-by-chunk (manual DMA, depth 3) and runs a
[8, K] x [K, N] dot per chunk with the weight converted from the stored
dtype — the tiled-megakernel inner pattern. Variants:
  int8      : int8 storage, astype(bf16) (the known-free hw convert)
  fp8       : e4m3 storage, astype(bf16) (Mosaic software convert)
  fp8-f32   : e4m3 -> float32 -> bf16
  fp8-bits  : e4m3 via integer bit assembly (normals only; subnormals
              flushed — our quantizer clamps to the normal range)
Prints effective GB/s per variant (DMA floor ~760).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

R, C = 2048, 2048  # 4 MB int8 chunks
N_CHUNKS = 256     # 1 GB


def _convert(w, how):
    if how == "int8":
        return w.astype(jnp.bfloat16)
    if how == "fp8":
        return w.astype(jnp.bfloat16)
    if how == "fp8-f32":
        return w.astype(jnp.float32).astype(jnp.bfloat16)
    if how == "fp8-bits":
        u = lax.bitcast_convert_type(w, jnp.uint8).astype(jnp.int32)
        rest = u & 0x7F
        bits = jnp.where(rest == 0, 0,
                         ((u & 0x80) << 8) | ((rest + 960) << 4))
        return lax.bitcast_convert_type(bits.astype(jnp.uint16),
                                        jnp.bfloat16)
    raise ValueError(how)


def _kernel(x_ref, w_hbm, o_ref, buf, sem, *, n, how):
    depth = buf.shape[0]

    def cp(j, slot):
        return pltpu.make_async_copy(w_hbm.at[j], buf.at[slot],
                                     sem.at[slot])

    for d in range(depth - 1):
        @pl.when(d < n)
        def _(d=d):
            cp(d, d).start()

    x = x_ref[...]

    def body(j, acc):
        slot = lax.rem(j, depth)
        nxt = j + depth - 1

        @pl.when(nxt < n)
        def _():
            cp(nxt, lax.rem(nxt, depth)).start()

        cp(j, slot).wait()
        wb = _convert(buf[slot], how)
        y = jnp.dot(x, wb, preferred_element_type=jnp.float32)
        return acc + y

    acc = lax.fori_loop(0, n, body, jnp.zeros((8, C), jnp.float32))
    o_ref[...] = acc


def run(how):
    dt_store = jnp.int8 if how == "int8" else jnp.float8_e4m3fn
    if how == "int8":
        w = jnp.ones((N_CHUNKS, R, C), jnp.int8)
    else:
        w = jnp.full((N_CHUNKS, R, C), 0.5, jnp.float8_e4m3fn)
    x = jnp.ones((8, R), jnp.bfloat16)

    fn = pl.pallas_call(
        functools.partial(_kernel, n=N_CHUNKS, how=how),
        in_specs=[pl.BlockSpec((8, R), lambda: (0, 0)),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((8, C), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, R, C), dt_store),
                        pltpu.SemaphoreType.DMA((3,))],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=126 << 20),
    )

    @functools.partial(jax.jit, static_argnames=("m",))
    def run_m(x, w, m):
        def body(c, _):
            y = fn(x + c.astype(x.dtype), w)
            return jnp.sum(y) * 1e-20, ()
        out, _ = lax.scan(body, jnp.float32(0), None, length=m)
        return out

    def f(m):
        return float(run_m(x, w, m))

    f(2), f(6)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); f(2); tl = time.perf_counter() - t0
        t0 = time.perf_counter(); f(6); th = time.perf_counter() - t0
        m = (th - tl) / 4
        if m > 0:
            best = min(best, m)
    gb = N_CHUNKS * R * C / best / 1e9
    print(f"{how:9s}: {best * 1e3:8.2f} ms/GB-pass  ({gb:6.1f} GB/s eff)",
          flush=True)


if __name__ == "__main__":
    for how in (sys.argv[1:] or ["int8", "fp8", "fp8-f32", "fp8-bits"]):
        try:
            run(how)
        except Exception as e:
            print(f"{how}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
