#!/bin/bash
# Run a command with a stall watchdog: if its log stops growing for
# STALL_S seconds (the axon-tunnel wedge signature — a fresh process
# blocks inside jax init on a futex and never prints), kill and retry.
# Unlike a plain `timeout`, this reclaims wedged minutes immediately
# while letting genuinely long runs proceed as long as they keep
# printing progress.
#
#   bash scripts/stall_watchdog.sh <log> <attempts> <stall_s> -- cmd...

set -u
log=$1 attempts=$2 stall=$3; shift 4

for i in $(seq 1 "$attempts"); do
  echo "=== watchdog attempt $i/$attempts ($(date +%H:%M:%S)) ===" >> "$log"
  "$@" >> "$log" 2>&1 &
  pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    age=$(( $(date +%s) - $(stat -c %Y "$log") ))
    if [ "$age" -ge "$stall" ]; then
      echo "=== watchdog: no output for ${age}s, killing pid $pid ===" >> "$log"
      kill "$pid" 2>/dev/null
      sleep 5
      kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid" 2>/dev/null
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "=== watchdog OK (attempt $i) ===" >> "$log"
    exit 0
  fi
  echo "=== watchdog: rc=$rc; sleeping 120s before retry ===" >> "$log"
  sleep 120
done
echo "=== watchdog GAVE UP after $attempts attempts ===" >> "$log"
exit 1
