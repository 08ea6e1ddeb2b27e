#!/bin/bash
# Serialized TPU session runner: one device process at a time, claim-retry
# on relay UNAVAILABLE, hard stop on any other failure (possible kernel
# fault -> do not hammer the chip). Usage: run_sessions.sh 16 17 18
cd /root/repo || exit 1
: > /tmp/tpu_runner.log
for s in "$@"; do
  done=0
  for attempt in 1 2 3 4 5 6; do
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
  if [ "$done" != 1 ]; then
    echo "$(date -u +%T) session ${s} exhausted retries; stopping" >> /tmp/tpu_runner.log
    exit 1
  fi
done
echo "$(date -u +%T) ALL SESSIONS DONE" >> /tmp/tpu_runner.log
