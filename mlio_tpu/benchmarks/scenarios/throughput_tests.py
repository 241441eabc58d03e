"""Throughput scenarios: standard, batch-size scaling, multi-device,
mixed-precision sweep.

Rebuild of /root/reference/benchmarks/scenarios/throughput_tests.py
(standard :21, batch scaling :94, multi-GPU :196, mixed precision :331) —
the multi-GPU scenario runs over a real jax mesh (data-parallel sharding)
instead of multi-process NCCL.
"""
from __future__ import annotations

import time
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mlio_tpu.benchmarks import metrics as M
from mlio_tpu.models.spec import ModelSpec
from mlio_tpu.models.transformer import Impl, forward


def _timed_forward(spec, params, ids, impl, iters=5):
    fn = jax.jit(lambda p, i: forward(p, spec, i, impl=impl)[0])
    _ = np.asarray(fn(params, ids))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(fn(params, ids))
        times.append(time.perf_counter() - t0)
    return times


def standard_throughput_test(spec: ModelSpec, params, *, batch: int = 8,
                             seq_len: int = 128, impl: Impl = Impl(),
                             iters: int = 5) -> Dict[str, Any]:
    """(parity: throughput_tests.py:21-92)."""
    ids = jax.random.randint(jax.random.PRNGKey(0), (batch, seq_len), 0,
                             spec.vocab_size)
    times = _timed_forward(spec, params, ids, impl, iters)
    mean = float(np.mean(times))
    return {"scenario": "standard_throughput", "batch": batch,
            "seq_len": seq_len,
            **M.throughput_tokens_per_sec(batch * seq_len, mean),
            **M.latency_percentiles(times)}


def batch_scaling_test(spec: ModelSpec, params, *,
                       batch_sizes: Sequence[int] = (1, 2, 4, 8),
                       seq_len: int = 128, impl: Impl = Impl()
                       ) -> List[Dict[str, Any]]:
    """(parity: throughput_tests.py:94-194)."""
    return [standard_throughput_test(spec, params, batch=b, seq_len=seq_len,
                                     impl=impl) for b in batch_sizes]


def multi_device_throughput_test(spec: ModelSpec, params, *, batch: int = 8,
                                 seq_len: int = 128, impl: Impl = Impl()
                                 ) -> Dict[str, Any]:
    """Data-parallel over all local devices
    (parity: throughput_tests.py:196-329)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mlio_tpu.parallel import make_mesh

    n = jax.device_count()
    mesh = make_mesh(data=n)
    ids = jax.random.randint(jax.random.PRNGKey(0), (batch * n, seq_len), 0,
                             spec.vocab_size)
    ids = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    params_rep = jax.device_put(params, NamedSharding(mesh, P()))
    times = _timed_forward(spec, params_rep, ids, impl)
    mean = float(np.mean(times))
    return {"scenario": "multi_device_throughput", "num_devices": n,
            "global_batch": batch * n,
            **M.throughput_tokens_per_sec(batch * n * seq_len, mean, n),
            **M.latency_percentiles(times)}


def mixed_precision_sweep(spec: ModelSpec, params, *, batch: int = 4,
                          seq_len: int = 128) -> List[Dict[str, Any]]:
    """fp32 vs bf16 vs int8-weights sweep
    (parity: throughput_tests.py:331+, plus the quantized path)."""
    from mlio_tpu.runtime.quantization import quantize_params

    out = []
    variants = {
        "fp32": jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32) if hasattr(x, "astype") else x,
            params),
        "bf16": jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if hasattr(x, "astype") else x,
            params),
    }
    for name, p in variants.items():
        r = standard_throughput_test(spec, p, batch=batch, seq_len=seq_len)
        r["precision"] = name
        r["scenario"] = "mixed_precision"
        out.append(r)
    qp = quantize_params(variants["bf16"], spec, "int8")
    r = standard_throughput_test(spec, qp, batch=batch, seq_len=seq_len)
    r["precision"] = "int8-weights"
    r["scenario"] = "mixed_precision"
    out.append(r)
    return out
