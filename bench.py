"""Headline benchmark: GPT-2 decode tokens/sec/chip on TPU (bf16, fused kernels).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s/chip", "vs_baseline": N}
vs_baseline = fraction of the HBM-bandwidth decode roofline (weights + KV
actually read per step), i.e. the BASELINE.json "≥90% of roofline" target
measured directly. Run on the real TPU (no env overrides).

Methodology (honest by construction):
  * the prompt prefills to ~70% of the cache so decode steps genuinely
    read the KV bytes the roofline counts (kernels scan only to `pos`);
  * throughput is the TWO-LENGTH MARGINAL (T(320 new) - T(64 new)) / 256,
    cancelling prefill, dispatch, and compile-cache effects;
  * the roofline's KV term uses the average context of the marginal
    window, not the full cache.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp


BATCH = 8
PROMPT = 704
N_LO = 64
N_HI = 320
CACHE_LEN = 1024
HBM_GBPS = 819.0  # v5e HBM nameplate bandwidth (strict roofline)
# Same-process measured ceiling on this chip: NOTHING streams above this
# (dma_bench.py r4 study: XLA gemv 758, Pallas depth-3 DMA 758-775, auto
# pipeline 755-761) — the nameplate is not achievable by any pattern, so
# the JSON also records the fraction of the MEASURED ceiling.
HBM_GBPS_MEASURED = 760.0


def main():
    from mlio_tpu.models import Impl, load_model
    from mlio_tpu.runtime import generate

    backend = jax.default_backend()
    spec, params = load_model("gpt2", dtype=jnp.bfloat16)
    # flash attention (batched decode kernel) dominates; fused norms shave
    # ~4% more; fused MLP is negative at M=8 decode so it stays off here.
    impl = (Impl(attention="flash", norm="fused") if backend == "tpu"
            else Impl())

    ids = jnp.zeros((BATCH, PROMPT), jnp.int32)

    def run(new):
        out = generate(params, spec, ids, max_new_tokens=new, impl=impl,
                       cache_len=CACHE_LEN)
        # tiny host fetch = hard sync without a big transfer
        return int(out[0, -1])

    t_compile = time.time()
    run(N_LO)
    run(N_HI)  # compile + warm both lengths
    print(f"# compile+warm took {time.time() - t_compile:.0f}s",
          file=sys.stderr)
    # Estimator: (min T_hi - min T_lo) / steps. Noise on this shared chip
    # only ADDS time, so each side's minimum approaches its true time;
    # differencing per-rep pairs lets one inflated T_lo fabricate an
    # impossibly small or negative marginal.
    # In-process best-of-N with recorded spread: the shared chip shows
    # ±5-9% cross-run variance (co-tenant contention), so the captured
    # number takes the min over enough draws to escape a bad window and
    # reports how tight the lower tail was.
    lows, highs = [], []
    for _ in range(10):
        t0 = time.time()
        run(N_LO)
        lows.append(time.time() - t0)
        t0 = time.time()
        run(N_HI)
        highs.append(time.time() - t0)
    best = (min(highs) - min(lows)) / (N_HI - N_LO)
    second = (sorted(highs)[1] - min(lows)) / (N_HI - N_LO)
    spread = (second - best) / best  # gap min -> 2nd-best, lower tail width
    tok_s = BATCH / best

    # HBM roofline for batched decode: weights once per step + the KV
    # prefix actually scanned per sequence (average ctx of the marginal
    # decode window).
    avg_ctx = PROMPT + (N_LO + N_HI) // 2
    param_bytes = spec.num_params() * 2
    kv_bytes_per_seq = 2 * spec.num_layers * avg_ctx * spec.kv_dim * 2
    step_bytes = param_bytes + BATCH * kv_bytes_per_seq
    roofline_tok_s = HBM_GBPS * 1e9 / step_bytes * BATCH

    print(json.dumps({
        "metric": "gpt2_decode_tokens_per_sec_per_chip",
        "value": round(tok_s, 1),
        "unit": "tok/s/chip",
        "vs_baseline": round(tok_s / roofline_tok_s, 3),
        "vs_measured_ceiling": round(
            tok_s / (roofline_tok_s * HBM_GBPS_MEASURED / HBM_GBPS), 3),
        "spread": round(spread, 4),
    }))
    print(f"# backend={backend} batch={BATCH} prompt={PROMPT} "
          f"marginal={N_LO}->{N_HI} avg_ctx={avg_ctx} "
          f"step={best * 1e3:.3f}ms roofline={roofline_tok_s:.0f} "
          f"spread={spread * 100:.1f}%", file=sys.stderr)


if __name__ == "__main__":
    main()
