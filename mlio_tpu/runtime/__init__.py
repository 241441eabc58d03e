from mlio_tpu.runtime.kv_cache import (
    BlockManager,
    PagedKVCache,
    SequenceMetadata,
    cache_memory_bytes,
    calculate_num_blocks,
    init_cache,
)
from mlio_tpu.runtime.generate import generate, greedy_generate
from mlio_tpu.runtime.sampling import SamplingMethod, sample

__all__ = [
    "BlockManager",
    "PagedKVCache",
    "SequenceMetadata",
    "cache_memory_bytes",
    "calculate_num_blocks",
    "init_cache",
    "generate",
    "greedy_generate",
    "SamplingMethod",
    "sample",
]
