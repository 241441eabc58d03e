"""Compile-time tile autotuning for the Pallas kernels.

Parity: the reference autotunes its Triton flash-attention kernel over six
block configs keyed on shape+flags (@triton.autotune,
/root/reference/kernels/triton/flash_attention_kernels.py:39-52). Triton can
re-time candidates at every launch; TPU Pallas tile sizes are *static* under
jit, so the TPU-native shape of the same capability is an explicit offline
tuning step:

  * ``tune_flash(...)`` times candidate (block_q, block_kv) pairs eagerly on
    the real device for one shape class and records the winner;
  * the persistent table (``autotune_table.json`` next to this file, plus an
    optional user cache at ``$MLIO_AUTOTUNE_CACHE``) is consulted by
    ``flash_attention`` at trace time whenever the caller did not pin block
    sizes — so tuned choices apply to every jitted model automatically;
  * ``python -m mlio_tpu.ops.autotune`` tunes the standard shape suite
    (prefill 1K/2K/4K, the 65K chunked long-context path) and prints a table.

Shape classes bucket the sequence lengths to powers of two: tile choice is
insensitive to small Sq/Skv changes but strongly sensitive to the
chunked-vs-resident KV regime, head dim, and dtype.
"""
from __future__ import annotations

import functools
import json
import os
import time
from typing import Dict, List, Optional, Tuple

_TABLE_PATH = os.path.join(os.path.dirname(__file__), "autotune_table.json")


def _bucket(n: int) -> int:
    """Round up to the next power of two (shape-class bucketing)."""
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


def shape_class(kind: str, sq: int, skv: int, d: int, dtype: str,
                causal: bool, chunked: bool) -> str:
    return (f"{kind}/sq{_bucket(sq)}/skv{_bucket(skv)}/d{d}/{dtype}/"
            f"{'causal' if causal else 'full'}/"
            f"{'chunked' if chunked else 'resident'}")


@functools.lru_cache(maxsize=None)
def _load_tables() -> Dict[str, Dict]:
    table: Dict[str, Dict] = {}
    for path in (_TABLE_PATH,
                 os.path.expanduser("~/.cache/mlio_tpu/autotune_table.json"),
                 os.environ.get("MLIO_AUTOTUNE_CACHE", "")):
        if path and os.path.exists(path):
            try:
                with open(path) as f:
                    table.update(json.load(f))
            except (OSError, json.JSONDecodeError):
                pass
    return table


def lookup(kind: str, sq: int, skv: int, d: int, dtype: str,
           causal: bool, chunked: bool) -> Optional[Dict]:
    """Tuned config for a shape class, or None (trace-time, pure Python)."""
    return _load_tables().get(
        shape_class(kind, sq, skv, d, dtype, causal, chunked))


def _save(key: str, entry: Dict, path: Optional[str] = None) -> None:
    """Record a tuned entry. Atomic (temp-file rename, so concurrent tuners
    never interleave partial JSON) and tolerant of a read-only install: if
    the package dir is not writable, fall back to the user cache path."""
    candidates = [p for p in (
        path, os.environ.get("MLIO_AUTOTUNE_CACHE"), _TABLE_PATH,
        os.path.expanduser("~/.cache/mlio_tpu/autotune_table.json"),
    ) if p]
    for target in candidates:
        table = {}
        if os.path.exists(target):
            try:
                with open(target) as f:
                    table = json.load(f)
            except (OSError, json.JSONDecodeError):
                pass
        table[key] = entry
        tmp = f"{target}.tmp.{os.getpid()}"
        try:
            os.makedirs(os.path.dirname(target) or ".", exist_ok=True)
            with open(tmp, "w") as f:
                json.dump(table, f, indent=1, sort_keys=True)
            os.replace(tmp, target)
        except OSError:
            continue
        _load_tables.cache_clear()
        return
    import warnings

    warnings.warn(  # never drop a tuned entry silently (read-only install
        # + unwritable HOME + no MLIO_AUTOTUNE_CACHE override)
        f"autotune: could not write tuned entry {key!r} to any of "
        f"{candidates}; set MLIO_AUTOTUNE_CACHE to a writable path",
        RuntimeWarning, stacklevel=2)


# ---------------------------------------------------------------------------
# Flash-attention forward tuning
# ---------------------------------------------------------------------------

#: Candidate (block_q, block_kv) tiles. The MXU wants >=128 on both sides;
#: 8-sublane minimum on q. Mirrors the spirit of the reference's six
#: configs (flash_attention_kernels.py:39-52) at TPU-native sizes.
FLASH_CANDIDATES: Tuple[Tuple[int, int], ...] = (
    (128, 256), (128, 512), (256, 256), (256, 512), (256, 1024),
    (512, 512), (512, 1024), (512, 2048), (1024, 1024), (1024, 2048),
    # streamed long-context tiles: q tiles are nearly free in VMEM there,
    # and bigger bq divides total KV refetch traffic
    (1024, 4096), (2048, 1024), (2048, 2048),
)


def _marginal_time(make_run, lo: int = 3, hi: int = 10,
                   reps: int = 3) -> float:
    """Per-iteration seconds via the two-length in-jit marginal.

    ``make_run(n)`` must return a zero-arg callable that runs the op n
    times inside ONE jit (lax.scan with a carry dependence) and returns a
    host scalar (a real device sync — on remote backends
    ``block_until_ready`` alone returns before the compute finishes and
    produces nonsense timings)."""
    f_lo, f_hi = make_run(lo), make_run(hi)
    f_lo(), f_hi()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        f_lo()
        tl = time.perf_counter() - t0
        t0 = time.perf_counter()
        f_hi()
        th = time.perf_counter() - t0
        m = (th - tl) / (hi - lo)
        if m > 0:
            best = min(best, m)
    if not (best > 0 and best != float("inf")):
        # every rep produced a non-positive marginal (plausible on a noisy
        # shared chip): raising here lets the candidate loops skip this
        # candidate instead of recording ms=Infinity / tflops=0 in the table
        raise RuntimeError("no finite marginal measurement (noisy device?)")
    return best


def tune_flash(
    batch: int, sq: int, skv: int, num_heads: int, num_kv_heads: int,
    head_dim: int, dtype=None, causal: bool = True,
    candidates: Optional[List[Tuple[int, int]]] = None,
    save: bool = True, save_path: Optional[str] = None,
    verbose: bool = False,
) -> Dict:
    """Time flash-attention tile candidates on the current device and record
    the winner for this shape class. Returns the winning entry
    ``{"block_q", "block_kv", "tflops", "ms"}``."""
    import jax
    import jax.numpy as jnp

    from mlio_tpu.ops.flash_attention import flash_attention

    dtype = dtype or jnp.bfloat16
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (batch, sq, num_heads, head_dim), dtype)
    k = jax.random.normal(kk, (batch, skv, num_kv_heads, head_dim), dtype)
    v = jax.random.normal(kv_, (batch, skv, num_kv_heads, head_dim), dtype)

    # same regime split the kernel wrapper uses (flash_attention.py)
    chunked = (2 * -(-skv // 128) * 128 * max(head_dim, 128)
               * jnp.dtype(dtype).itemsize > 6 << 20)
    flops = 2 * 2 * batch * num_heads * sq * skv * head_dim
    if causal and sq == skv:
        flops //= 2

    import functools as _ft

    @_ft.partial(jax.jit, static_argnames=("n", "bq", "bkv"))
    def run_n(q, k, v, n, bq, bkv):
        def step(c, _):
            qq = q + c.astype(q.dtype)  # carry dependence: no CSE/hoist
            o = flash_attention(qq, k, v, causal=causal,
                                block_q=bq, block_kv=bkv)
            return jnp.sum(o[0, :8, 0, :].astype(jnp.float32)) * 1e-20, ()
        out, _ = jax.lax.scan(step, jnp.float32(0), None, length=n)
        return out

    # scale the scan lengths so the marginal signal (hi-lo iterations)
    # is ~0.5s of device time — per-call dispatch noise on the remote
    # backend is tens of ms, so sub-ms-per-iter shapes need hundreds of
    # in-jit iterations to measure above it
    est_iter_s = max(flops / 40e12, 1e-5)
    hi_n = min(2000, max(10, int(0.5 / est_iter_s)))
    lo_n = max(3, hi_n // 4)

    best: Optional[Dict] = None
    for bq, bkv in candidates or FLASH_CANDIDATES:
        if bq > _bucket(sq) or bkv > _bucket(skv):
            continue
        try:
            def make_run(n, bq=bq, bkv=bkv):
                return lambda: float(run_n(q, k, v, n, bq, bkv))
            dt = _marginal_time(make_run, lo=lo_n, hi=hi_n)
        except Exception as e:  # VMEM overflow / unsupported tiling
            if verbose:
                print(f"  ({bq:5d},{bkv:5d})  failed: {type(e).__name__}")
            continue
        tf = flops / dt / 1e12
        if verbose:
            print(f"  ({bq:5d},{bkv:5d})  {dt * 1e3:8.3f} ms  {tf:6.1f} TF/s")
        if best is None or dt < best["_dt"]:
            best = {"block_q": bq, "block_kv": bkv, "_dt": dt,
                    "ms": round(dt * 1e3, 4), "tflops": round(tf, 1)}
    if best is None:
        raise RuntimeError("no tile candidate compiled for this shape")
    best.pop("_dt")
    if save:
        keyname = shape_class("flash_fwd", sq, skv, head_dim,
                              jnp.dtype(dtype).name, causal, bool(chunked))
        _save(keyname, best, save_path)
    return best


STANDARD_SUITE = (
    # (batch, sq, skv, heads, kv_heads, head_dim) — GPT-2 / Llama prefill
    (8, 1024, 1024, 12, 12, 64),
    (4, 2048, 2048, 32, 32, 128),
    (1, 4096, 4096, 32, 32, 128),
    (1, 8192, 8192, 8, 8, 128),
    (1, 65536, 65536, 4, 4, 128),   # chunked long-context path
)


def main(argv: Optional[List[str]] = None) -> None:
    import argparse

    import jax

    p = argparse.ArgumentParser(
        description="Tune Pallas kernel knobs on the current device")
    p.add_argument("--shape", action="append", default=None,
                   help="B,Sq,Skv,H,Hkv,D (repeatable); default = suite")
    p.add_argument("--decode", action="store_true",
                   help="also tune the fused-decode megakernel knobs")
    p.add_argument("--tiled", action="store_true",
                   help="also tune the big-model tiled decode knobs")
    p.add_argument("--no-save", action="store_true")
    args = p.parse_args(argv)
    shapes = ([tuple(int(x) for x in s.split(",")) for s in args.shape]
              if args.shape else STANDARD_SUITE)
    print(f"# backend={jax.default_backend()}")
    for b, sq, skv, h, hkv, d in shapes:
        print(f"flash_fwd B={b} Sq={sq} Skv={skv} H={h}/{hkv} D={d}:")
        best = tune_flash(b, sq, skv, h, hkv, d, save=not args.no_save,
                          verbose=True)
        print(f"  -> best ({best['block_q']},{best['block_kv']}) "
              f"{best['tflops']} TF/s")
    if args.decode:
        print("mega_decode (gpt2 headline class):")
        print("  ->", tune_decode(save=not args.no_save, verbose=True))
    if args.tiled:
        print("tiled_decode (llama2-7b int8 class):")
        print("  ->", tune_decode_tiled(save=not args.no_save,
                                        verbose=True))




# ---------------------------------------------------------------------------
# Decode-megakernel tuning (cache scan block + lm_head vocab chunk)
# ---------------------------------------------------------------------------

def mega_decode_key(h: int, kvd: int, batch: int, cache_len: int,
                    quant: bool) -> str:
    return (f"mega_decode/h{h}/kv{kvd}/b{batch}/s{_bucket(cache_len)}/"
            f"{'int8' if quant else 'bf16'}")


def tiled_decode_key(h: int, kvd: int, batch: int, cache_len: int,
                     quant: bool) -> str:
    """Shape class for the big-model tiled decode megakernel
    (ops/decode_tiled.py); tunable: cache_block (KV scan tokens/DMA)."""
    return (f"tiled_decode/h{h}/kv{kvd}/b{batch}/s{_bucket(cache_len)}/"
            f"{'int8' if quant else 'bf16'}")


def lookup_key(key: str) -> Optional[Dict]:
    return _load_tables().get(key)


DECODE_CANDIDATES = tuple(
    {"cache_block": cb, "vocab_chunk": vc}
    for cb in (64, 128, 256, 512) for vc in (2560, 4096, 8192))


def tune_decode(preset: str = "gpt2", batch: int = 8, prompt: int = 704,
                cache_len: int = 1024, lo: int = 64, hi: int = 320,
                candidates=None, save: bool = True,
                save_path: Optional[str] = None, verbose: bool = False,
                quant: bool = False) -> Dict:
    """Time fused-decode (cache_block, vocab_chunk) combos on the real chip
    with the two-length-marginal methodology and record the winner.
    ``quant=True`` tunes the INT8-KV + INT8-weight variant of the class
    (separate table key; the quantized kernel has different DMA/compute
    balance, e.g. single- vs double-buffered KV)."""
    import functools
    import jax
    import jax.numpy as jnp

    from mlio_tpu.models import Impl, load_model
    from mlio_tpu.models.transformer import forward
    from mlio_tpu.ops.decode_layer import (
        decode_layer_stack,
        pad_lm_head_for_mega,
        pad_scales_for_mega,
    )
    from mlio_tpu.runtime.kv_cache import init_cache

    spec, params = load_model(preset, dtype=jnp.bfloat16)
    if quant:
        from mlio_tpu.runtime.quantization import quantize_params

        params = quantize_params(params, spec, "int8")
    impl = Impl(attention="flash", norm="fused")
    ids = jnp.zeros((batch, prompt), jnp.int32)

    # mirror the SHIPPING fused path (runtime/generate.py): combined k|v
    # cache when the lane split is 128-aligned, learned pos-embed folded
    # into the kernel when the table length allows the aligned 8-row DMA.
    # (quantized caches keep split k/v + scale caches)
    combined = spec.kv_dim % 128 == 0 and not quant
    pe_in_kernel = (spec.positional == "learned"
                    and spec.max_seq_len % 8 == 0)

    @functools.partial(jax.jit,
                       static_argnames=("n", "cb", "vc", "lm_V", "kd"))
    def run(params, lm_w, ids, n, cb, vc, lm_V, kd=None):
        cache = init_cache(spec, batch, cache_len, dtype=jnp.bfloat16,
                          quant="int8" if quant else None)
        logits, cache = forward(params, spec, ids, impl=impl, cache=cache)
        tok = jnp.argmax(logits[:, -1, :], -1).astype(jnp.int32)
        ck = cache["k"].reshape(*cache["k"].shape[:3], -1)
        cv = cache["v"].reshape(*cache["v"].shape[:3], -1)
        ks = vs = None
        if quant:
            ks = pad_scales_for_mega(cache["k_scale"], spec.num_kv_heads)
            vs = pad_scales_for_mega(cache["v_scale"], spec.num_kv_heads)
        if combined:
            ck = jnp.concatenate([ck, cv], axis=-1)
            cv = None

        # mirror the SHIPPING fused path: multi-step in-kernel (the whole
        # greedy loop as ONE pallas_call) when the class supports it —
        # tuning the per-step-launch variant would tune the wrong kernel
        multi_ok = combined and not quant and (
            spec.positional != "learned" or pe_in_kernel)
        if multi_ok:
            pos0 = cache["pos"]
            x = params["tok_embed"][tok]
            if spec.positional == "learned":
                cs = sn = None
            else:
                from mlio_tpu.models.transformer import rope_cos_sin
                cs, sn = rope_cos_sin(pos0 + jnp.arange(n), spec.rope_dim,
                                      spec.rope_theta, jnp.float32)
            out = decode_layer_stack(
                x, params["blocks"], ck, cv, pos0, cs, sn, spec=spec,
                head_norm=(params["final_scale"], params["final_bias"]),
                lm_head=lm_w, lm_vmajor=True, vocab_chunk=vc,
                vocab_size=lm_V, cache_block=cb, kv_combined=True,
                kv_depth=kd, steps=n,
                pos_embed=params["pos_embed"] if pe_in_kernel else None)
            return out[-1][-1, :, 0]

        def step(carry, _):
            ck, cv, ks, vs, pos, tok = carry
            x = params["tok_embed"][tok]
            if spec.positional == "learned":
                if not pe_in_kernel:
                    x = x + params["pos_embed"][pos].astype(x.dtype)
                cs = sn = None
            else:
                from mlio_tpu.models.transformer import rope_cos_sin
                cs, sn = rope_cos_sin(jnp.reshape(pos, (1,)), spec.rope_dim,
                                      spec.rope_theta, jnp.float32)
            out = decode_layer_stack(
                x, params["blocks"], ck, cv, pos, cs, sn, spec=spec,
                k_scales=ks, v_scales=vs,
                head_norm=(params["final_scale"], params["final_bias"]),
                lm_head=lm_w, lm_vmajor=True, vocab_chunk=vc,
                vocab_size=lm_V, cache_block=cb, kv_combined=combined,
                kv_depth=kd,
                pos_embed=params["pos_embed"] if pe_in_kernel else None)
            ck2 = out[1]
            cv2 = None if combined else out[2]
            ks2, vs2 = (out[3], out[4]) if quant else (None, None)
            return (ck2, cv2, ks2, vs2, pos + 1, out[-1][:, 0]), ()

        (ck, cv, ks, vs, pos, tok), _ = jax.lax.scan(
            step, (ck, cv, ks, vs, cache["pos"], tok), None, length=n)
        return tok

    best = None
    for cand in candidates or DECODE_CANDIDATES:
        cb, vc = cand["cache_block"], cand["vocab_chunk"]
        kd = cand.get("kv_depth")
        lm_w, lm_V, _ = pad_lm_head_for_mega(params["tok_embed"], True, vc)

        def f(n):
            return int(run(params, lm_w, ids, n, cb, vc, lm_V, kd)[0])
        try:
            f(lo), f(hi)
        except Exception as e:
            if verbose:
                print(f"  cb={cb} vc={vc} kd={kd}: failed "
                      f"{type(e).__name__}")
            continue
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); f(lo); tl = time.perf_counter() - t0
            t0 = time.perf_counter(); f(hi); th = time.perf_counter() - t0
            dt = min(dt, (th - tl) / (hi - lo))
        if verbose:
            print(f"  cb={cb:4d} vc={vc:5d} kd={kd}: {dt * 1e3:7.3f} "
                  f"ms/step", flush=True)
        if not (0 < dt < float("inf")):  # noisy chip: no finite marginal
            continue
        if best is None or dt < best["_dt"]:
            best = {"cache_block": cb, "vocab_chunk": vc, "_dt": dt,
                    "ms": round(dt * 1e3, 4)}
            if kd is not None:
                best["kv_depth"] = kd
    if best is None:
        raise RuntimeError("no decode candidate ran")
    best.pop("_dt")
    if save:
        key = mega_decode_key(spec.hidden_size, spec.kv_dim, batch,
                              cache_len, quant)
        _save(key, best, save_path)
    return best


TILED_CANDIDATES = (
    # (ka, ic, ws) tiling sweep at the measured-best cache knobs, then
    # cache knobs at the best tiling class (round-5 finding: phase count
    # is nearly free in the loop-phased kernel; chunk size and pool depth
    # are the levers)
    {"cache_block": 64, "kv_depth": 2},
    {"cache_block": 64, "kv_depth": 2, "ka": 2, "ic": 1408, "ws": 2},
    {"cache_block": 64, "kv_depth": 2, "ka": 2, "ic": 1024, "ws": 2},
    {"cache_block": 64, "kv_depth": 2, "ka": 4, "ic": 1408, "ws": 2},
    {"cache_block": 64, "kv_depth": 2, "ka": 2, "ic": 2048, "ws": 2},
    {"cache_block": 128, "kv_depth": 3, "ka": 2, "ic": 1408, "ws": 2},
    {"cache_block": 64, "kv_depth": 2, "ka": 2, "ic": 1408, "ws": 3},
)

def tune_decode_tiled(preset: str = "llama2-7b", batch: int = 8,
                      prompt: int = 704, cache_len: int = 1024,
                      lo: int = 16, hi: int = 64, candidates=None,
                      save: bool = True, save_path: Optional[str] = None,
                      verbose: bool = False) -> Dict:
    """Time tiled-decode cache_block candidates (7B-class INT8 weights +
    INT8 KV, the llama7b-int8 bench config) with the marginal methodology
    and record the winner under the tiled_decode shape class."""
    import functools
    import jax
    import jax.numpy as jnp

    from mlio_tpu.models import Impl, get_spec
    from mlio_tpu.models.transformer import forward, rope_cos_sin
    from mlio_tpu.ops.decode_tiled import (
        choose_tiling,
        decode_layer_tiled,
        pad_scales_for_tiled,
    )
    from mlio_tpu.runtime.kv_cache import init_cache
    from mlio_tpu.runtime.quantization import init_quantized_params

    from mlio_tpu.ops.decode_tiled import Tiling

    spec = get_spec(preset)
    params = init_quantized_params(spec, jax.random.PRNGKey(0))
    impl = Impl(attention="flash", norm="fused")
    ids = jnp.zeros((batch, prompt), jnp.int32)
    base_tiling = choose_tiling(spec, batch, 1, 1, weight_fmt="int8")

    def cand_tiling(cand):
        if "ka" not in cand:
            return base_tiling
        ka, ic = cand["ka"], cand["ic"]
        if spec.num_heads % ka or spec.num_kv_heads % ka:
            return None
        return Tiling(hg=spec.num_heads // ka, ic=ic, ka=ka,
                      km=-(-spec.intermediate_size // ic),
                      ws=cand.get("ws", 2))

    @functools.partial(jax.jit, static_argnames=("n", "cb", "kd", "tiling"))
    def run(params, ids, n, cb, kd, tiling):
        cache = init_cache(spec, batch, cache_len, dtype=jnp.bfloat16,
                           quant="int8")
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
            x = params["tok_embed"][tok]
            cs, sn = rope_cos_sin(jnp.reshape(pos, (1,)), spec.rope_dim,
                                  spec.rope_theta, jnp.float32)
            out = decode_layer_tiled(
                x, params["blocks"], ck, cv, pos, cs, sn,
                spec=spec, k_scales=ks, v_scales=vs, tiling=tiling,
                cache_block=cb, kv_depth=kd)
            h = out[0]
            from mlio_tpu import ops as _ops
            hn = _ops.norm(h[:, None], params["final_scale"],
                           params["final_bias"], kind=spec.norm,
                           eps=spec.norm_eps)
            lg = _ops.linear(hn, params["lm_head"])
            tok = jnp.argmax(lg[:, 0], -1).astype(jnp.int32)
            return (out[1], out[2], out[3], out[4], pos + 1, tok), ()

        (ck, cv, ks, vs, pos, tok), _ = jax.lax.scan(
            step, (ck, cv, ks, vs, cache["pos"], tok), None, length=n)
        return tok

    best = None
    for cand in candidates or TILED_CANDIDATES:
        cb = cand["cache_block"]
        kd = cand.get("kv_depth", 3)
        tl_ = cand_tiling(cand)
        if tl_ is None:
            continue

        def f(n):
            return int(run(params, ids, n, cb, kd, tl_)[0])
        try:
            f(lo), f(hi)
        except Exception as e:
            if verbose:
                print(f"  cb={cb} kd={kd} {tl_}: failed "
                      f"{type(e).__name__}: {e}")
            continue
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); f(lo); tl = time.perf_counter() - t0
            t0 = time.perf_counter(); f(hi); th = time.perf_counter() - t0
            dt = min(dt, (th - tl) / (hi - lo))
        if verbose:
            print(f"  cb={cb:4d} kd={kd} ka={tl_.ka} ic={tl_.ic} "
                  f"ws={tl_.ws}: {dt * 1e3:8.3f} ms/step", flush=True)
        if not (0 < dt < float("inf")):  # noisy chip: no finite marginal
            continue
        if best is None or dt < best["_dt"]:
            best = {"cache_block": cb, "kv_depth": kd, "_dt": dt,
                    "ka": tl_.ka, "ic": tl_.ic, "ws": tl_.ws,
                    "ms": round(dt * 1e3, 4)}
    if best is None:
        raise RuntimeError("no tiled decode candidate ran")
    best.pop("_dt")
    if save:
        _save(tiled_decode_key(spec.hidden_size, spec.kv_dim, batch,
                               cache_len, True), best, save_path)
    return best


if __name__ == "__main__":
    main()
