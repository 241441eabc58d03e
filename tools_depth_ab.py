"""Same-process A/B: megakernel KV stream depth on the headline config.

Forces kv_depth via the tuned-table lookup (monkeypatched) and busts the
jit cache with per-depth scan lengths so each depth actually retraces.
Marginal methodology identical to bench.py.
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

BATCH, PROMPT, CACHE_LEN = 8, 704, 1024


def measure(depth, n_lo, n_hi):
    from mlio_tpu.models import Impl, load_model
    from mlio_tpu.ops import autotune
    from mlio_tpu.runtime import generate

    orig = autotune.lookup_key

    def patched(key):
        d = dict(orig(key) or {})
        if depth is not None:
            d["kv_depth"] = depth
        return d

    autotune.lookup_key = patched
    try:
        spec, params = measure.cache
    except AttributeError:
        spec, params = load_model("gpt2", dtype=jnp.bfloat16)
        measure.cache = (spec, params)
    impl = Impl(attention="flash", norm="fused")
    ids = jnp.zeros((BATCH, PROMPT), jnp.int32)

    def run(new):
        out = generate(params, spec, ids, max_new_tokens=new, impl=impl,
                       cache_len=CACHE_LEN)
        return int(out[0, -1])

    run(n_lo), run(n_hi)
    lows, highs = [], []
    for _ in range(5):
        t0 = time.time(); run(n_lo); lows.append(time.time() - t0)
        t0 = time.time(); run(n_hi); highs.append(time.time() - t0)
    autotune.lookup_key = orig
    step = (min(highs) - min(lows)) / (n_hi - n_lo)
    return step


def main():
    depths = [int(d) for d in (sys.argv[1:] or ["2", "3", "4"])]
    for i, d in enumerate(depths):
        step = measure(d, 64 - i, 320 - i)
        print(f"kv_depth={d}: step={step * 1e3:.3f} ms "
              f"({BATCH / step:.0f} tok/s)", flush=True)


if __name__ == "__main__":
    main()
