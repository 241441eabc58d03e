from mlio_tpu.benchmarks.scenarios.latency_tests import (
    first_token_latency_test,
    latency_under_load,
    latency_under_offered_load,
    standard_latency_test,
    tail_latency_test,
)
from mlio_tpu.benchmarks.scenarios.throughput_tests import (
    batch_scaling_test,
    mixed_precision_sweep,
    multi_device_throughput_test,
    standard_throughput_test,
)

__all__ = [
    "first_token_latency_test",
    "latency_under_load",
    "latency_under_offered_load",
    "standard_latency_test",
    "tail_latency_test",
    "batch_scaling_test",
    "mixed_precision_sweep",
    "multi_device_throughput_test",
    "standard_throughput_test",
]
