#!/bin/bash
# Serialized TPU session runner, v2: one device process at a time.
# Retries indefinitely on relay UNAVAILABLE (long outages observed:
# 3h+), hard stop on any other failure (possible kernel fault -> do not
# hammer the chip). Usage: run_sessions2.sh 16 17 18 19 20
cd /root/repo || exit 1
: > /tmp/tpu_runner.log
for s in "$@"; do
  done=0
  attempt=0
  while true; do
    attempt=$((attempt + 1))
    echo "$(date -u +%T) session ${s} attempt ${attempt} starting" >> /tmp/tpu_runner.log
    python -u "tools/tpu_session${s}.py" > "/tmp/tpu_session${s}.log" 2>&1
    rc=$?
    if grep -q "SESSION${s} DONE" "/tmp/tpu_session${s}.log"; then
      echo "$(date -u +%T) session ${s} DONE" >> /tmp/tpu_runner.log
      done=1
      break
    fi
    if grep -q "UNAVAILABLE" "/tmp/tpu_session${s}.log"; then
      echo "$(date -u +%T) session ${s} attempt ${attempt} UNAVAILABLE rc=${rc}; sleep 600" >> /tmp/tpu_runner.log
      sleep 600
      continue
    fi
    echo "$(date -u +%T) session ${s} FAILED rc=${rc} (non-UNAVAILABLE); stopping" >> /tmp/tpu_runner.log
    exit 1
  done
done
echo "$(date -u +%T) ALL SESSIONS DONE" >> /tmp/tpu_runner.log
