#!/bin/bash
# Pass 3: re-tune with the fixed tuners, then final scenario reruns.
cd /root/repo
LOG=/tmp/tpu_jobs3.log
echo "=== pass3 start $(date)" >> $LOG
wait_alive () {
  for i in $(seq 1 40); do
    if timeout 90 python -c "import jax, jax.numpy as j; print(float((j.ones((64,64))@j.ones((64,64))).sum()))" >/dev/null 2>&1; then
      echo "alive $(date)" >> $LOG; return 0
    fi
    sleep 120
  done
  return 1
}
DEADLINE=$(date -d "2026-08-21 12:30" +%s)
run_one () {
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "deadline passed; skipping $1" >> $LOG; return 0
  fi
  echo "--- $1 $(date)" >> $LOG
  timeout ${2:-1800} python run_benches.py "$1" >> $LOG 2>&1
  echo "--- $1 done rc=$? $(date)" >> $LOG
}
wait_alive || exit 1
echo "--- tune-65k(fixed) $(date)" >> $LOG
timeout 1800 python -m mlio_tpu.ops.autotune --shape 1,65536,65536,4,4,128 >> $LOG 2>&1
echo "--- tune-65k done rc=$? $(date)" >> $LOG
wait_alive
echo "--- tune-gpt2-int8 $(date)" >> $LOG
timeout 1800 python -c "
from mlio_tpu.ops.autotune import tune_decode
print('BEST int8:', tune_decode(quant=True, verbose=True, candidates=[
    {'cache_block': 128, 'vocab_chunk': 2048},
    {'cache_block': 128, 'vocab_chunk': 2560},
    {'cache_block': 128, 'vocab_chunk': 4096},
    {'cache_block': 256, 'vocab_chunk': 2048},
]))" >> $LOG 2>&1
echo "--- tune-gpt2-int8 done rc=$? $(date)" >> $LOG
wait_alive; run_one ppl-gate 2700
wait_alive; run_one moe-13b-int8 2400
wait_alive; run_one gpt2-int8 1500
wait_alive; run_one flash-65k 1200
wait_alive; run_one ring-65k 1200
wait_alive; run_one headline 1500
wait_alive; run_one llama7b-int8 2000
echo "=== pass3 complete $(date)" >> $LOG
touch /tmp/tpu_jobs3.done
