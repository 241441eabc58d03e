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

__all__ = [
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
]
