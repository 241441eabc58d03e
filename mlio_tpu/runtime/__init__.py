from mlio_tpu.runtime.kv_cache import (
    BlockManager,
    PagedKVCache,
    SequenceMetadata,
    cache_memory_bytes,
    calculate_num_blocks,
    init_cache,
)
from mlio_tpu.runtime.generate import generate, greedy_generate
from mlio_tpu.runtime.sampling import SamplingMethod, probabilities, sample
from mlio_tpu.runtime.speculative import speculative_generate
from mlio_tpu.runtime.engine import InferenceEngine, Request
from mlio_tpu.runtime.paged_forward import decode_paged, prefill_paged
from mlio_tpu.runtime.quantization import (
    apply_activation_scales,
    calibrate_activation_scales,
    quantize_params,
    quantized_size_bytes,
)
from mlio_tpu.runtime.scheduler import (
    CachingBlockManager,
    PyScheduler,
    make_scheduler,
)

__all__ = [
    "BlockManager",
    "PagedKVCache",
    "SequenceMetadata",
    "cache_memory_bytes",
    "calculate_num_blocks",
    "init_cache",
    "generate",
    "InferenceEngine",
    "Request",
    "decode_paged",
    "prefill_paged",
    "greedy_generate",
    "SamplingMethod",
    "quantize_params",
    "quantized_size_bytes",
    "calibrate_activation_scales",
    "apply_activation_scales",
    "sample",
    "probabilities",
    "speculative_generate",
    "CachingBlockManager",
    "PyScheduler",
    "make_scheduler",
]
