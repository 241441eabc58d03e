#!/bin/bash
# Round-4 sequential chip jobs: flash 65K retune + long-context measures,
# tiled-decode retune (incl. kv_depth) for the 7B and latency-4k classes,
# then re-measure the affected scenarios into BENCH_extra.json.
set -x
cd /root/repo

# 1. retune the 65K streamed flash class with the widened candidate set
timeout 2400 python -c "
from mlio_tpu.ops.autotune import tune_flash
print(tune_flash(1, 65536, 65536, 4, 4, 128, verbose=True))
" 2>&1 | grep -v WARNING

# 2. measure long-context scenarios with the improved kernel + tiles
timeout 1800 python run_benches.py flash-65k 2>&1 | grep -v WARNING | tail -2
timeout 1800 python run_benches.py ring-65k 2>&1 | grep -v WARNING | tail -2

# 3. retune tiled decode: 7B b8/s1024 and the latency-4k b1/s4096 class
timeout 3600 python -c "
from mlio_tpu.ops.autotune import tune_decode_tiled
print('b8/s1024:', tune_decode_tiled(verbose=True))
" 2>&1 | grep -v WARNING
timeout 3600 python -c "
from mlio_tpu.ops.autotune import tune_decode_tiled
print('b1/s4096:', tune_decode_tiled(batch=1, prompt=3904, cache_len=4096,
                                     lo=32, hi=128, verbose=True))
" 2>&1 | grep -v WARNING

# 4. re-measure the scenarios that consume those tables
timeout 1800 python run_benches.py llama7b-int8 2>&1 | grep -v WARNING | tail -2
timeout 1800 python run_benches.py latency-4k 2>&1 | grep -v WARNING | tail -2
