#!/bin/bash
# Wait for the axon TPU tunnel to heal, then run the full bench_all suite
# producing BENCH_extra_r03.json.  Log everything to /tmp/bench_r03.log.
cd /root/repo
LOG=/tmp/bench_r03.log
echo "=== retry_bench_r03 start $(date)" >> "$LOG"
for i in $(seq 1 120); do
  if timeout 120 python -c "import jax, jax.numpy as jnp; jnp.sum(jnp.ones((8,8))).block_until_ready()" >> "$LOG" 2>&1; then
    echo "=== tunnel alive after probe $i $(date)" >> "$LOG"
    break
  fi
  echo "--- probe $i failed $(date)" >> "$LOG"
  sleep 60
done
echo "=== launching bench_all $(date)" >> "$LOG"
timeout 5400 python -u samples/bench_all.py BENCH_extra_r03.json >> "$LOG" 2>&1
RC=$?
echo "=== bench_all exit $RC $(date)" >> "$LOG"
