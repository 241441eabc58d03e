"""Continuous-batching inference engine over the paged KV cache.

The serving runtime the reference sketches but never finishes
(/root/reference/baseline/inference.py:1306-1592 TransformerInferenceRunner +
PagedKVCache; the scheduler/preemption TODOs at inference.py:1093,1215):
fixed decode slots, per-request paged block allocation with refcounted
blocks, prompt-bucketed prefill (static shapes — one compile per bucket),
batched single-token decode steps, EOS/max-token completion, block
reclamation, and admission of queued requests into freed slots.

Host-side state (queues, block accounting) stays in Python; device state
(pools, tables, context lengths) moves through donated jitted steps.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mlio_tpu.models.spec import ModelSpec
from mlio_tpu.models.transformer import Impl
from mlio_tpu.ops.paged_attention import init_kv_pools
from mlio_tpu.runtime.kv_cache import BlockManager
from mlio_tpu.runtime.paged_forward import decode_paged, prefill_paged
from mlio_tpu.runtime.sampling import SamplingMethod, sample


@dataclasses.dataclass
class Request:
    req_id: int
    prompt: List[int]
    max_new_tokens: int = 32
    eos_token: Optional[int] = None
    # filled in by the engine
    output: List[int] = dataclasses.field(default_factory=list)
    slot: Optional[int] = None
    done: bool = False


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket {buckets[-1]}")


class InferenceEngine:
    """Continuous batching over paged KV (vLLM-style, TPU static shapes)."""

    def __init__(
        self,
        spec: ModelSpec,
        params,
        *,
        max_batch: int = 8,
        max_seq_len: Optional[int] = None,
        num_blocks: Optional[int] = None,
        block_size: int = 16,
        impl: Impl = Impl(),
        method: SamplingMethod = SamplingMethod(),
        prefill_buckets: Sequence[int] = (32, 128, 512, 2048),
        dtype=jnp.bfloat16,
        rng: Optional[jax.Array] = None,
    ):
        spec.validate()
        self.spec = spec
        self.params = params
        self.impl = impl
        self.method = method
        self.max_batch = max_batch
        self.max_seq_len = max_seq_len or spec.max_seq_len
        self.block_size = block_size
        self.max_blocks_per_seq = -(-self.max_seq_len // block_size)
        self.prefill_buckets = [b for b in prefill_buckets
                                if b <= self.max_seq_len] or [self.max_seq_len]
        if self.prefill_buckets[-1] < self.max_seq_len:
            self.prefill_buckets.append(self.max_seq_len)
        if num_blocks is None:
            num_blocks = max_batch * self.max_blocks_per_seq + 1
        self.k_pool, self.v_pool = init_kv_pools(
            spec.num_layers, num_blocks, spec.num_kv_heads, block_size,
            spec.head_size, dtype=dtype)
        self.manager = BlockManager(num_blocks, block_size)
        # Block 0 is the scratch block: inactive slots write there.
        self.manager.free_blocks.remove(0)
        self.manager.refcounts[0] = 1

        # Device-side per-slot state (host mirrors, shipped each step).
        self.tables = np.zeros((max_batch, self.max_blocks_per_seq), np.int32)
        self.ctx = np.ones((max_batch,), np.int32)
        self.cur_tokens = np.zeros((max_batch,), np.int32)
        self.slot_req: List[Optional[Request]] = [None] * max_batch
        self.slot_blocks: List[List[int]] = [[] for _ in range(max_batch)]

        self.queue: List[Request] = []
        self.finished: List[Request] = []
        self._next_id = 0
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.stats = {"steps": 0, "prefills": 0, "generated_tokens": 0,
                      "preempted": 0}

    # -- request lifecycle ---------------------------------------------------

    def submit(self, prompt: Sequence[int], max_new_tokens: int = 32,
               eos_token: Optional[int] = None) -> int:
        assert len(prompt) >= 1
        assert len(prompt) + max_new_tokens <= self.max_seq_len, \
            "prompt + generation exceeds max_seq_len"
        req = Request(self._next_id, list(prompt), max_new_tokens, eos_token)
        self._next_id += 1
        self.queue.append(req)
        return req.req_id

    def _free_slot(self, slot: int) -> None:
        for b in self.slot_blocks[slot]:
            self.manager.free(b)
        self.slot_blocks[slot] = []
        self.slot_req[slot] = None
        self.tables[slot, :] = 0
        self.ctx[slot] = 1
        self.cur_tokens[slot] = 0

    def _try_admit(self) -> None:
        """Admit queued requests into free slots (prefill each)."""
        for slot in range(self.max_batch):
            if self.slot_req[slot] is not None or not self.queue:
                continue
            req = self.queue[0]
            n_prompt = len(req.prompt)
            need = -(-(n_prompt + req.max_new_tokens) // self.block_size)
            if self.manager.num_free < need:
                break  # not enough memory yet; wait for completions
            self.queue.pop(0)
            blocks = [self.manager.allocate() for _ in range(need)]
            self.slot_blocks[slot] = blocks
            self.slot_req[slot] = req
            req.slot = slot
            self.tables[slot, :] = 0
            self.tables[slot, : len(blocks)] = blocks
            self._prefill(slot, req)

    def _prefill(self, slot: int, req: Request) -> None:
        n = len(req.prompt)
        bucket = _bucket(n, self.prefill_buckets)
        ids = np.zeros((1, bucket), np.int32)
        ids[0, :n] = req.prompt
        table_row = jnp.asarray(self.tables[slot : slot + 1])
        logits, self.k_pool, self.v_pool = prefill_paged(
            self.params, self.spec, jnp.asarray(ids), self.k_pool,
            self.v_pool, table_row, jnp.asarray([n], jnp.int32),
            jnp.zeros((1,), jnp.int32), impl=self.impl)
        self.rng, sub = jax.random.split(self.rng)
        tok = int(sample(logits, sub, self.method)[0])
        req.output.append(tok)
        self.cur_tokens[slot] = tok
        self.ctx[slot] = n + 1
        self.stats["prefills"] += 1
        self.stats["generated_tokens"] += 1
        self._maybe_finish(slot)

    def _maybe_finish(self, slot: int) -> None:
        req = self.slot_req[slot]
        if req is None:
            return
        last = req.output[-1] if req.output else None
        if (len(req.output) >= req.max_new_tokens
                or (req.eos_token is not None and last == req.eos_token)):
            req.done = True
            self.finished.append(req)
            self._free_slot(slot)

    # -- stepping ------------------------------------------------------------

    @property
    def num_active(self) -> int:
        return sum(r is not None for r in self.slot_req)

    def step(self) -> None:
        """Admit + one batched decode step for all active slots."""
        self._try_admit()
        if self.num_active == 0:
            return
        logits, self.k_pool, self.v_pool = decode_paged(
            self.params, self.spec, jnp.asarray(self.cur_tokens),
            self.k_pool, self.v_pool, jnp.asarray(self.tables),
            jnp.asarray(self.ctx), impl=self.impl)
        self.rng, sub = jax.random.split(self.rng)
        toks = np.asarray(sample(logits, sub, self.method))
        self.stats["steps"] += 1
        for slot in range(self.max_batch):
            req = self.slot_req[slot]
            if req is None:
                continue
            tok = int(toks[slot])
            req.output.append(tok)
            self.cur_tokens[slot] = tok
            self.ctx[slot] += 1
            self.stats["generated_tokens"] += 1
            self._maybe_finish(slot)

    def run(self, prompts: Sequence[Sequence[int]], max_new_tokens: int = 32,
            eos_token: Optional[int] = None) -> List[List[int]]:
        """Submit all prompts, run until completion, return outputs in order."""
        ids = [self.submit(p, max_new_tokens, eos_token) for p in prompts]
        guard = 0
        while self.queue or self.num_active:
            self.step()
            guard += 1
            if guard > 100_000:
                raise RuntimeError("engine did not converge")
        by_id = {r.req_id: r.output for r in self.finished}
        return [by_id[i] for i in ids]

    def memory_stats(self) -> Dict[str, float]:
        used = self.manager.num_blocks - self.manager.num_free
        return {
            "num_blocks": self.manager.num_blocks,
            "used_blocks": used,
            "utilization": used / self.manager.num_blocks,
            "active_slots": self.num_active,
            "queued": len(self.queue),
            **self.stats,
        }
