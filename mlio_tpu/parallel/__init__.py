from mlio_tpu.parallel.mesh import AXES, make_mesh, initialize_multihost, sharding
from mlio_tpu.parallel.tensor_parallel import (
    data_specs,
    param_specs,
    shard_params,
    validate_tp_divisibility,
)
from mlio_tpu.parallel.sequence_parallel import (
    gather_sequence,
    scatter_sequence,
    sequence_parallel_attention,
)
from mlio_tpu.parallel.collectives import (
    all_gather,
    all_reduce,
    all_to_all,
    barrier,
    broadcast,
    estimate_collective_time,
    reduce_scatter,
    ring_exchange,
)
from mlio_tpu.parallel.auto_config import (
    AutoParallelConfig,
    CandidatePlan,
    HardwareSpec,
    ParallelismCostModel,
    detect_hardware,
)
from mlio_tpu.parallel.orchestrator import ParallelOrchestrator, ParallelPlan
from mlio_tpu.parallel.adaptive import (
    AdaptiveExecutor,
    RuntimeMonitor,
    device_memory_stats,
)

__all__ = [
    "AdaptiveExecutor",
    "RuntimeMonitor",
    "device_memory_stats",
    "AXES",
    "make_mesh",
    "initialize_multihost",
    "sharding",
    "data_specs",
    "param_specs",
    "shard_params",
    "validate_tp_divisibility",
    "gather_sequence",
    "scatter_sequence",
    "sequence_parallel_attention",
    "all_gather",
    "all_reduce",
    "all_to_all",
    "barrier",
    "broadcast",
    "estimate_collective_time",
    "reduce_scatter",
    "ring_exchange",
    "AutoParallelConfig",
    "CandidatePlan",
    "HardwareSpec",
    "ParallelismCostModel",
    "detect_hardware",
    "ParallelOrchestrator",
    "ParallelPlan",
]
