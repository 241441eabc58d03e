from mlio_tpu.profiling.profiler import (
    ProfileResults,
    ProfilerConfig,
    ProfilerWrapper,
    device_memory_stats,
)
from mlio_tpu.profiling.memory import (
    DeviceMemoryTracker,
    detect_memory_leak,
    find_max_batch_size,
    per_layer_memory,
)
from mlio_tpu.profiling.bottleneck import (
    Bottleneck,
    BottleneckAnalyzer,
    BottleneckReport,
    BottleneckType,
)
from mlio_tpu.profiling.kernel_profiler import (
    KernelProfileResults,
    KernelProfiler,
)
from mlio_tpu.profiling.xplane import (
    OpStats,
    OpTable,
    op_table_from_trace,
    parse_xspace,
)
from mlio_tpu.profiling import visualizer

__all__ = [
    "KernelProfileResults",
    "KernelProfiler",
    "OpStats",
    "OpTable",
    "op_table_from_trace",
    "parse_xspace",
    "ProfileResults",
    "ProfilerConfig",
    "ProfilerWrapper",
    "device_memory_stats",
    "DeviceMemoryTracker",
    "detect_memory_leak",
    "find_max_batch_size",
    "per_layer_memory",
    "Bottleneck",
    "BottleneckAnalyzer",
    "BottleneckReport",
    "BottleneckType",
    "visualizer",
]
