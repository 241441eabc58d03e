"""Parallel orchestrator: one plan → mesh, sharded params, parallel forward.

Rebuild of /root/reference/parallelism/orchestrator.py (ParallelConfig
:20-120, InferenceSchedule :123-222, the executor hierarchy :225-483,
ModelParallelWrapper :486-671, ParallelOrchestrator :674-1166). The five
executor classes and the wrapper module collapse into one orchestrator:

  * TP — NamedSharding on weights (Megatron specs), GSPMD inserts the
    all-reduces (replacing TensorParallelExecutor's manual stream math).
  * SP — sequence-dim input shardings + the shard_map attention strategies
    in sequence_parallel.py (replacing SequenceParallelExecutor's hooks).
  * PP — a functional GPipe schedule inside shard_map over the "pipe" axis
    with hidden states rotating via ppermute (replacing InferenceSchedule's
    per-microbatch dist.send/recv on a dedicated CUDA stream).
  * DP — batch-dim sharding.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mlio_tpu.models.spec import ModelSpec
from mlio_tpu.models.transformer import (
    Impl,
    forward,
    rope_cos_sin,
    run_layer_stack,
)
from mlio_tpu.parallel import tensor_parallel as tp_rules
from mlio_tpu.parallel.auto_config import (
    AutoParallelConfig,
    CandidatePlan,
    HardwareSpec,
    ParallelismCostModel,
    detect_hardware,
)
from mlio_tpu.parallel.mesh import make_mesh


@dataclasses.dataclass(frozen=True)
class ParallelPlan:
    """(parity: ParallelConfig orchestrator.py:20-120)."""

    tensor: int = 1
    sequence: int = 1
    pipeline: int = 1
    data: int = 1
    sequence_strategy: str = "ring"
    comm_dtype: Any = jnp.bfloat16
    microbatches: int = 0  # 0 → = pipeline size

    @property
    def world(self) -> int:
        return self.tensor * self.sequence * self.pipeline * self.data

    def validate(self, spec: ModelSpec, num_devices: int) -> None:
        """(parity: validate_parallel_config parallel_utils.py:836-880)."""
        if self.world > num_devices:
            raise ValueError(f"plan world {self.world} > devices {num_devices}")
        if self.pipeline > 8:
            raise ValueError("pipeline depth > 8 unsupported")
        if spec.num_layers % max(1, self.pipeline):
            raise ValueError("layers must divide evenly into pipeline stages")
        if spec.num_heads % self.tensor:
            raise ValueError("heads not divisible by tensor size")
        if self.tensor > 1:
            tp_rules.validate_tp_divisibility(spec, self.tensor)

    @staticmethod
    def from_candidate(c: CandidatePlan, **kw) -> "ParallelPlan":
        return ParallelPlan(tensor=c.tp, sequence=c.sp, pipeline=c.pp,
                            data=c.dp, **kw)


class ParallelOrchestrator:
    """(parity: ParallelOrchestrator orchestrator.py:674-1166)."""

    def __init__(self, plan: ParallelPlan, spec: ModelSpec,
                 hw: Optional[HardwareSpec] = None):
        self.plan = plan
        self.spec = spec
        self.hw = hw or detect_hardware()
        plan.validate(spec, jax.device_count())
        self.mesh = make_mesh(data=plan.data, seq=plan.sequence,
                              pipe=plan.pipeline, tensor=plan.tensor)
        self._cost = ParallelismCostModel(spec, self.hw)

    # -- model / data placement ----------------------------------------------

    def shard_params(self, params):
        """TP (+PP) placement (parity: configure_model orchestrator.py:718 +
        ModelParallelConverter weight slicing tensor_parallel.py:617-815)."""
        specs = tp_rules.param_specs(self.spec)
        if self.plan.pipeline > 1:
            # stacked-layer axis over the pipe mesh axis
            def add_pipe(s):
                if s is None:
                    return None
                parts = ("pipe",) + tuple(s)[1:]
                return P(*parts)

            specs = dict(specs)
            specs["blocks"] = {k: add_pipe(v)
                               for k, v in specs["blocks"].items()}
        specs = tp_rules._prune_to(params, specs)
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s))
            if x is not None else None,
            params, specs, is_leaf=lambda x: x is None)

    def shard_inputs(self, ids: jax.Array) -> jax.Array:
        """Batch over data, sequence over seq
        (parity: partition_batch orchestrator.py:920-1010)."""
        spec = P("data", "seq") if self.plan.sequence > 1 else P("data", None)
        return jax.device_put(ids, NamedSharding(self.mesh, spec))

    # -- forward -------------------------------------------------------------

    def forward_fn(self, impl: Impl = Impl()):
        """Build the parallel forward callable for this plan."""
        if self.plan.pipeline > 1:
            return self._pipeline_forward_fn(impl)

        @jax.jit
        def fn(params, ids):
            logits, _ = forward(params, self.spec, ids, impl=impl)
            return logits

        return fn

    def _pipeline_forward_fn(self, impl: Impl):
        spec = self.spec
        plan = self.plan
        pp = plan.pipeline
        M = plan.microbatches or pp

        def fn(params, ids):
            B, S = ids.shape
            assert B % M == 0, "batch must divide into microbatches"
            x = params["tok_embed"][ids]
            if spec.positional == "learned":
                x = x + params["pos_embed"][jnp.arange(S)].astype(x.dtype)
                cos = sin = None
            else:
                cos, sin = rope_cos_sin(jnp.arange(S), spec.head_size,
                                        spec.rope_theta)
            mb = B // M
            xs = x.reshape(M, mb, S, -1)

            def pipe_body(blocks_local, xs):
                rank = lax.axis_index("pipe")
                steps = M + pp - 1
                buf = jnp.zeros_like(xs)
                cur = jnp.zeros(xs.shape[1:], xs.dtype)

                def step(carry, t):
                    cur, buf = carry
                    inject = lax.dynamic_index_in_dim(
                        xs, jnp.clip(t, 0, M - 1), 0, keepdims=False)
                    cur = jnp.where((rank == 0) & (t < M), inject, cur)
                    out = run_layer_stack(cur, blocks_local, spec, impl,
                                          cos, sin)
                    done = t - (pp - 1)
                    valid = (rank == pp - 1) & (done >= 0)
                    idx = jnp.clip(done, 0, M - 1)
                    prev = lax.dynamic_index_in_dim(buf, idx, 0,
                                                    keepdims=False)
                    upd = prev + jnp.where(valid, out, 0).astype(buf.dtype)
                    buf = lax.dynamic_update_index_in_dim(buf, upd, idx, 0)
                    # hand the stage output to the next pipe rank
                    perm = [(i, (i + 1) % pp) for i in range(pp)]
                    cur = lax.ppermute(out, "pipe", perm)
                    return (cur, buf), None

                (cur, buf), _ = lax.scan(step, (cur, buf), jnp.arange(steps))
                return lax.psum(buf, "pipe")

            hidden = shard_map(
                pipe_body, mesh=self.mesh,
                in_specs=(P("pipe"), P()),
                out_specs=P(),
                check_vma=False,
            )(params["blocks"], xs)
            x = hidden.reshape(B, S, -1)

            from mlio_tpu import ops

            x = ops.norm(x, params["final_scale"], params["final_bias"],
                         kind=spec.norm, eps=spec.norm_eps, impl=impl)
            if params["lm_head"] is not None:
                return ops.linear(x, params["lm_head"], impl=impl)
            return x @ params["tok_embed"].T.astype(x.dtype)

        return jax.jit(fn)

    # -- analytics -----------------------------------------------------------

    def memory_usage_estimate(self, batch: int, seq_len: int) -> Dict[str, float]:
        """(parity: orchestrator.py:847-1025)."""
        c = CandidatePlan(self.plan.tensor, self.plan.sequence,
                          self.plan.pipeline, self.plan.data)
        per_chip = self._cost.memory_per_chip(c, batch, seq_len)
        return {
            "bytes_per_chip": per_chip,
            "hbm_fraction": per_chip / (self.hw.hbm_gb * 1e9),
            "fits": per_chip < self.hw.hbm_gb * 1e9 * 0.9,
        }

    def throughput_estimate(self, batch: int, seq_len: int) -> Dict[str, float]:
        """(parity: orchestrator.py:1027-1166)."""
        c = CandidatePlan(self.plan.tensor, self.plan.sequence,
                          self.plan.pipeline, self.plan.data)
        t = self._cost.step_time(c, batch, seq_len)
        return {
            "step_time_s": t,
            "tokens_per_sec": batch * seq_len / t if t else 0.0,
            "comm_fraction": (self._cost.communication_time(c, batch, seq_len)
                              / t if t else 0.0),
        }

    @staticmethod
    def auto(spec: ModelSpec, batch: int = 8, seq_len: int = 2048,
             **plan_kw) -> "ParallelOrchestrator":
        """Pick the best plan via the cost-model search
        (parity: get_optimal_config orchestrator.py:1012 + auto_config)."""
        auto = AutoParallelConfig(spec)
        best = auto.best_plan(batch, seq_len)
        return ParallelOrchestrator(
            ParallelPlan.from_candidate(best, **plan_kw), spec, hw=auto.hw)
