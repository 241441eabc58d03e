"""Latency scenarios: standard, tail, under concurrent load, first-token.

Rebuild of /root/reference/benchmarks/scenarios/latency_tests.py
(standard :26, tail :98, under-load :190-316, first-token :317).
"""
from __future__ import annotations

import queue
import threading
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mlio_tpu.benchmarks import metrics as M
from mlio_tpu.models.spec import ModelSpec
from mlio_tpu.models.transformer import Impl, forward


def _forward_fn(spec, impl):
    return jax.jit(lambda p, i: forward(p, spec, i, impl=impl)[0])


def standard_latency_test(spec: ModelSpec, params, *, batch: int = 1,
                          seq_len: int = 128, iters: int = 20,
                          impl: Impl = Impl()) -> Dict[str, Any]:
    """(parity: latency_tests.py:26-96)."""
    fn = _forward_fn(spec, impl)
    ids = jax.random.randint(jax.random.PRNGKey(0), (batch, seq_len), 0,
                             spec.vocab_size)
    _ = np.asarray(fn(params, ids))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(fn(params, ids))
        times.append(time.perf_counter() - t0)
    return {"scenario": "standard_latency", "batch": batch,
            "seq_len": seq_len, **M.latency_percentiles(times)}


def tail_latency_test(spec: ModelSpec, params, *, seq_len: int = 128,
                      iters: int = 1000, impl: Impl = Impl()) -> Dict[str, Any]:
    """High-iteration tail capture incl. p99.99
    (parity: latency_tests.py:98-188, 1000 iterations)."""
    return {**standard_latency_test(spec, params, batch=1, seq_len=seq_len,
                                    iters=iters, impl=impl),
            "scenario": "tail_latency"}


def latency_under_load(spec: ModelSpec, params, *, seq_len: int = 64,
                       num_requests: int = 32, num_workers: int = 4,
                       impl: Impl = Impl()) -> Dict[str, Any]:
    """Threaded worker queue issuing concurrent requests
    (parity: latency_tests.py:190-316)."""
    fn = _forward_fn(spec, impl)
    ids = jax.random.randint(jax.random.PRNGKey(0), (1, seq_len), 0,
                             spec.vocab_size)
    _ = np.asarray(fn(params, ids))  # compile once

    q: "queue.Queue[int]" = queue.Queue()
    for i in range(num_requests):
        q.put(i)
    latencies: List[float] = []
    lock = threading.Lock()

    def worker():
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                return
            t0 = time.perf_counter()
            _ = np.asarray(fn(params, ids))
            dt = time.perf_counter() - t0
            with lock:
                latencies.append(dt)
            q.task_done()

    t_start = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(num_workers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    return {"scenario": "latency_under_load", "num_requests": num_requests,
            "num_workers": num_workers, "wall_s": wall,
            "requests_per_sec": num_requests / wall,
            **M.latency_percentiles(latencies)}


def latency_under_offered_load(spec: ModelSpec, params, *,
                               seq_len: int = 64,
                               arrival_rates: Sequence[float] = (
                                   2.0, 5.0, 10.0, 20.0),
                               duration_s: float = 3.0,
                               num_workers: int = 4,
                               impl: Impl = Impl()) -> Dict[str, Any]:
    """Open-loop arrival-rate sweep: requests arrive on a Poisson-ish clock
    at each offered rate (req/s) and latency is measured ARRIVAL-to-finish,
    so queueing delay shows up in the percentiles — the load-shape
    dimension of the reference's under-load scenario
    (parity: latency_tests.py:190-316's request-rate parameterization).

    Returns per-rate p50/p99 + achieved throughput; saturation is visible
    as achieved < offered with exploding tails."""
    fn = _forward_fn(spec, impl)
    ids = jax.random.randint(jax.random.PRNGKey(0), (1, seq_len), 0,
                             spec.vocab_size)
    _ = np.asarray(fn(params, ids))  # compile once

    sweep: List[Dict[str, Any]] = []
    rng = np.random.default_rng(0)
    for rate in arrival_rates:
        n = max(4, int(rate * duration_s))
        # open-loop arrival clock: exponential inter-arrival gaps
        gaps = rng.exponential(1.0 / rate, size=n)
        arrivals = np.cumsum(gaps)
        q: "queue.Queue[float]" = queue.Queue()
        latencies: List[float] = []
        lock = threading.Lock()
        t0 = time.perf_counter()

        def submitter():
            for a in arrivals:
                now = time.perf_counter() - t0
                if a > now:
                    time.sleep(a - now)
                q.put(time.perf_counter())
            for _ in range(num_workers):
                q.put(-1.0)  # poison pills

        def worker():
            while True:
                t_arr = q.get()
                if t_arr < 0:
                    return
                _ = np.asarray(fn(params, ids))
                dt = time.perf_counter() - t_arr
                with lock:
                    latencies.append(dt)

        threads = ([threading.Thread(target=submitter)]
                   + [threading.Thread(target=worker)
                      for _ in range(num_workers)])
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        pct = M.latency_percentiles(latencies)
        sweep.append({"offered_rps": rate, "achieved_rps": n / wall,
                      "p50_ms": pct["p50_ms"], "p99_ms": pct["p99_ms"],
                      "mean_ms": pct["mean_ms"], "n": n})
    return {"scenario": "latency_under_offered_load", "seq_len": seq_len,
            "num_workers": num_workers, "sweep": sweep}


def first_token_latency_test(spec: ModelSpec, params, *, prompt_len: int = 128,
                             iters: int = 5, impl: Impl = Impl()
                             ) -> Dict[str, Any]:
    """Prefill + first sampled token (parity: latency_tests.py:317+)."""
    from mlio_tpu.runtime.generate import generate

    ids = jax.random.randint(jax.random.PRNGKey(0), (1, prompt_len), 0,
                             spec.vocab_size)
    cache_len = prompt_len + 1

    def run():
        out = generate(params, spec, ids, max_new_tokens=1, impl=impl,
                       cache_len=cache_len)
        return int(out[0, -1])

    run()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return {"scenario": "first_token_latency", "prompt_len": prompt_len,
            **M.latency_percentiles(times)}
