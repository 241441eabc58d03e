"""mlio_tpu — TPU-native inference optimization framework.

A ground-up JAX/XLA/Pallas re-design of the capability surface of the
reference GPU framework ``aslitaser/ml-inference-optimizer`` (see SURVEY.md):
functional transformer runtime (GPT-2 / Llama families), Pallas kernels for
flash/ring/paged attention, fused MLP and norms, INT8 weight-only and KV-cache
quantization, mesh-based tensor/sequence parallelism over ICI, profiling,
benchmarking and reporting.

Unlike the reference (which monkeypatches PyTorch modules at runtime,
cf. /root/reference/baseline/inference.py:283, model_utils.py:600), every
optimization here is a compile-time choice: which kernel implementation,
which sharding — expressed through :class:`mlio_tpu.models.Impl` and
``jax.sharding.NamedSharding`` over a device mesh.
"""

__version__ = "0.1.0"

from mlio_tpu.config import OptimizerConfig, load_config, save_config, merge_configs
from mlio_tpu.models import ModelSpec, Impl

__all__ = [
    "OptimizerConfig",
    "load_config",
    "save_config",
    "merge_configs",
    "ModelSpec",
    "Impl",
    "__version__",
]
