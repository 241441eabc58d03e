from mlio_tpu.benchmarks.runners import (
    BenchmarkConfig,
    BenchmarkRunner,
    DEFAULT_VARIANTS,
    LatencyBenchmark,
    MemoryBenchmark,
    ScalingBenchmark,
    ThroughputBenchmark,
)
from mlio_tpu.benchmarks.reporting import BenchmarkReport, ReportGenerator
from mlio_tpu.benchmarks import metrics

__all__ = [
    "BenchmarkConfig",
    "BenchmarkRunner",
    "DEFAULT_VARIANTS",
    "LatencyBenchmark",
    "MemoryBenchmark",
    "ScalingBenchmark",
    "ThroughputBenchmark",
    "BenchmarkReport",
    "ReportGenerator",
    "metrics",
]
