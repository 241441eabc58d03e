from mlio_tpu.config.schema import (
    BenchmarkConfig,
    DashboardConfig,
    HardwareConfig,
    KernelConfig,
    ModelConfig,
    OptimizerConfig,
    ParallelismConfig,
    ProfilingConfig,
    QuantizationConfig,
)
from mlio_tpu.config.loader import (
    get_optimized_config,
    load_config,
    merge_configs,
    save_config,
)

__all__ = [
    "BenchmarkConfig",
    "DashboardConfig",
    "HardwareConfig",
    "KernelConfig",
    "ModelConfig",
    "OptimizerConfig",
    "ParallelismConfig",
    "ProfilingConfig",
    "QuantizationConfig",
    "get_optimized_config",
    "load_config",
    "merge_configs",
    "save_config",
]
