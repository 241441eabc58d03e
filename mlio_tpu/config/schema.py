"""Unified configuration schema.

Capability parity with the reference's pydantic tree
(/root/reference/config/config_schema.py:5-83) plus the per-subsystem
dataclass configs scattered through the reference
(FlashAttentionConfig, RingAttentionConfig, TensorParallelConfig,
SequenceParallelConfig, ParallelConfig, BenchmarkConfig, ProfilerConfig) —
unified here into one validated tree, TPU-flavored: device meshes instead of
GPU counts, Pallas kernel choices instead of Triton flags, ICI/DCN axes
instead of NCCL knobs.
"""
from __future__ import annotations

from typing import List, Optional

from pydantic import BaseModel, Field, model_validator


class HardwareConfig(BaseModel):
    """Target hardware description (reference: config_schema.py:5-12)."""

    platform: str = "tpu"  # "tpu" | "cpu" (cpu = virtual-device testing)
    num_chips: int = Field(1, ge=1)
    num_hosts: int = Field(1, ge=1)
    chip_type: str = "v5e"  # informational; used by the cost model
    hbm_gb_per_chip: float = 16.0
    memory_fraction: float = Field(0.9, gt=0.0, le=1.0)


class KernelConfig(BaseModel):
    """Which compute-path implementation to use per op
    (reference: config_schema.py:13-21 + FlashAttentionConfig
    flash_attention.py:53-104)."""

    attention: str = "flash"  # "dense" | "flash" | "ring" | "paged"
    mlp: str = "fused"  # "dense" | "fused"
    norm: str = "fused"  # "dense" | "fused"
    fused_ln_qkv: bool = False
    use_pallas: bool = True  # False = pure-jnp reference path everywhere
    block_q: int = 128
    block_kv: int = 128
    causal: bool = True
    precision: str = "bf16"  # "fp32" | "bf16" | "fp16"


class QuantizationConfig(BaseModel):
    """Weight / KV-cache quantization (reference: int8/int4 paths,
    baseline/inference.py:467-557)."""

    weights: str = "none"  # "none" | "int8" | "int4" | "fp8"
    kv_cache: str = "none"  # "none" | "int8" | "fp8"
    activation: str = "none"  # "none" | "int8"
    per_channel: bool = True
    calibration_samples: int = 16


class ParallelismConfig(BaseModel):
    """4D mesh layout (reference: ParallelConfig orchestrator.py:20-120)."""

    tensor_parallel_size: int = Field(1, ge=1)
    sequence_parallel_size: int = Field(1, ge=1)
    pipeline_parallel_size: int = Field(1, ge=1)
    data_parallel_size: int = Field(1, ge=1)
    expert_parallel_size: int = Field(1, ge=1)
    sequence_strategy: str = "ring"  # "local" | "ring" | "full" | "ulysses"
    communication_dtype: str = "bf16"
    auto: bool = False  # run the auto-config search instead

    @property
    def world_size(self) -> int:
        return (
            self.tensor_parallel_size
            * self.sequence_parallel_size
            * self.pipeline_parallel_size
            * self.data_parallel_size
        )


class ModelConfig(BaseModel):
    """Which model to run (reference: config_schema.py:32-43)."""

    name: str = "gpt2"
    checkpoint_path: Optional[str] = None  # local dir with HF weights
    dtype: str = "bf16"
    max_seq_len: int = 1024
    use_kv_cache: bool = True
    use_paged_kv_cache: bool = False
    kv_block_size: int = 16


class BenchmarkConfig(BaseModel):
    """(reference: config_schema.py:44-54 + benchmarks/runners.py:28-50)."""

    batch_sizes: List[int] = Field(default_factory=lambda: [1, 8])
    seq_lens: List[int] = Field(default_factory=lambda: [128, 1024])
    warmup_iters: int = 3
    iters: int = 10
    validate_outputs: bool = True
    rtol: float = 1e-3
    atol: float = 1e-3
    output_dir: str = "benchmark_results"


class ProfilingConfig(BaseModel):
    """(reference: config_schema.py:55-64 + ProfilerConfig
    torch_profiler.py:18-52)."""

    enabled: bool = False
    trace_dir: str = "profiles"
    capture_memory: bool = True
    cost_analysis: bool = True
    num_steps: int = 5


class DashboardConfig(BaseModel):
    """(reference: config_schema.py:65-72)."""

    enabled: bool = False
    host: str = "127.0.0.1"
    port: int = 8050
    results_dir: str = "benchmark_results"


class OptimizerConfig(BaseModel):
    """Root config (reference: config_schema.py:73-83)."""

    hardware: HardwareConfig = Field(default_factory=HardwareConfig)
    kernels: KernelConfig = Field(default_factory=KernelConfig)
    quantization: QuantizationConfig = Field(default_factory=QuantizationConfig)
    parallelism: ParallelismConfig = Field(default_factory=ParallelismConfig)
    model: ModelConfig = Field(default_factory=ModelConfig)
    benchmark: BenchmarkConfig = Field(default_factory=BenchmarkConfig)
    profiling: ProfilingConfig = Field(default_factory=ProfilingConfig)
    dashboard: DashboardConfig = Field(default_factory=DashboardConfig)

    @model_validator(mode="after")
    def _validate_world(self) -> "OptimizerConfig":
        world = self.parallelism.world_size
        chips = self.hardware.num_chips * self.hardware.num_hosts
        if not self.parallelism.auto and world > chips:
            raise ValueError(
                f"parallelism world size {world} exceeds available chips {chips}"
            )
        return self
