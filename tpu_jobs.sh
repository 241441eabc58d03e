#!/bin/bash
# Sequential TPU artifact capture. Run DETACHED (setsid nohup) — never kill
# a python mid-TPU-execution (that wedges the chip grant for ~an hour).
# Each scenario runs in its own process; a per-scenario timeout only fires
# if the chip wedged anyway (in which case the wait loop below re-gates).
cd /root/repo
LOG=/tmp/tpu_jobs.log
echo "=== tpu_jobs start $(date)" >> $LOG

wait_alive () {
  for i in $(seq 1 200); do
    if timeout 90 python -c "import jax, jax.numpy as j; print(float((j.ones((64,64))@j.ones((64,64))).sum()))" >/dev/null 2>&1; then
      echo "alive after $i probes $(date)" >> $LOG; return 0
    fi
    sleep 240
  done
  echo "never came alive" >> $LOG; return 1
}

run_one () {
  echo "--- $1 $(date)" >> $LOG
  timeout ${2:-2400} python run_benches.py "$1" >> $LOG 2>&1
  echo "--- $1 done rc=$? $(date)" >> $LOG
}

wait_alive || exit 1
run_one headline 1800
wait_alive
run_one gpt2-int8 1800
wait_alive
run_one llama7b-int8 2400
wait_alive
run_one latency-4k 2400
wait_alive
run_one flash-65k 1800
wait_alive
run_one ring-65k 1800
wait_alive
run_one llama70b-fp8 2400
wait_alive
run_one moe-13b-int8 2400
wait_alive
run_one spec-decode 2400
wait_alive
run_one ppl-gate 3000
wait_alive
echo "--- autotune $(date)" >> $LOG
timeout 3000 python -m mlio_tpu.ops.autotune --shape 4,2048,2048,32,32,128 --shape 1,65536,65536,4,4,128 --shape 8,1024,1024,12,12,64 >> $LOG 2>&1
echo "--- autotune done rc=$? $(date)" >> $LOG
wait_alive
run_one flash-65k 1800   # re-run with tuned tiles
echo "=== tpu_jobs complete $(date)" >> $LOG
touch /tmp/tpu_jobs.done
