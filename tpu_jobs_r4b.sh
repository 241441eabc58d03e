#!/bin/bash
set -x
cd /root/repo
# ring per-chunk shape class (sq 65536 x skv 8192 resident) was never tuned
timeout 2400 python -c "
from mlio_tpu.ops.autotune import tune_flash
print(tune_flash(1, 65536, 8192, 4, 4, 128, verbose=True))
" 2>&1 | grep -v WARNING
timeout 1800 python run_benches.py ring-65k 2>&1 | grep -v WARNING | tail -2
# retry the widened streamed candidates now the kernel has VMEM headroom
timeout 2400 python -c "
from mlio_tpu.ops.autotune import tune_flash
print(tune_flash(1, 65536, 65536, 4, 4, 128, verbose=True))
" 2>&1 | grep -v WARNING
timeout 1800 python run_benches.py flash-65k 2>&1 | grep -v WARNING | tail -2
# re-measure the int8-lm-head scenarios
timeout 1800 python run_benches.py llama7b-int8 2>&1 | grep -v WARNING | tail -2
timeout 1800 python run_benches.py latency-4k 2>&1 | grep -v WARNING | tail -2
timeout 1800 python run_benches.py moe-13b-int8 2>&1 | grep -v WARNING | tail -2
