#!/bin/bash
set -x
cd /root/repo
timeout 1800 python run_benches.py ring-65k 2>&1 | grep -v WARNING | tail -2
timeout 1800 python run_benches.py ring-shardmap 2>&1 | grep -v WARNING | tail -2
timeout 1800 python run_benches.py llama7b-int8 2>&1 | grep -v WARNING | tail -2
timeout 1800 python run_benches.py latency-4k 2>&1 | grep -v WARNING | tail -2
timeout 2400 python run_benches.py llama70b-fp8 2>&1 | grep -v WARNING | tail -2
timeout 2400 python run_benches.py spec-decode 2>&1 | grep -v WARNING | tail -2
timeout 1800 python run_benches.py gpt2-int8 2>&1 | grep -v WARNING | tail -2
timeout 1800 python run_benches.py headline 2>&1 | grep -v WARNING | tail -2
timeout 1800 python run_benches.py flash-65k 2>&1 | grep -v WARNING | tail -2
