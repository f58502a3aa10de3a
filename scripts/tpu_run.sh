#!/bin/bash
# Run a TPU-using command with a wedge watchdog.
#
# The axon remote occasionally restarts; a client with an in-flight op at
# that moment loses its tunnel connections and futex-waits forever (0%
# CPU, no ESTABLISHED socket to the relay ports 8082-8117). This wrapper
# detects that state (no CPU progress for $STALL_S seconds AND no
# established relay connection) and kills + restarts the command.
#
# Usage: scripts/tpu_run.sh <logfile> <cmd...>
set -u
LOG="$1"; shift
STALL_S=${STALL_S:-150}
RETRIES=${RETRIES:-6}
TIMEOUT_S=${TIMEOUT_S:-3600}

cpu_jiffies() {
  awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo ""
}

has_relay_conn() {
  ss -tn 2>/dev/null | grep -qE "127\.0\.0\.1:8(08[237]|09[237]|10[237]|11[237]) +"
}

for attempt in $(seq 1 "$RETRIES"); do
  echo "== attempt $attempt: $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1 &
  pid=$!
  start=$(date +%s)
  last_j=0
  last_change=$start
  while kill -0 "$pid" 2>/dev/null; do
    sleep 15
    now=$(date +%s)
    if [ $((now - start)) -gt "$TIMEOUT_S" ]; then
      echo "== timeout, killing $pid" >> "$LOG"
      kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      exit 124
    fi
    j=$(cpu_jiffies "$pid")
    [ -z "$j" ] && break
    if [ "$j" != "$last_j" ]; then
      last_j=$j
      last_change=$now
    elif [ $((now - last_change)) -gt "$STALL_S" ] && ! has_relay_conn; then
      echo "== wedge detected (no CPU ${STALL_S}s, no relay conn), restarting" >> "$LOG"
      kill -9 "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      sleep 10
      continue 2
    fi
  done
  wait "$pid"
  rc=$?
  if [ "$rc" -eq 0 ]; then
    exit 0
  fi
  echo "== exit rc=$rc" >> "$LOG"
  # non-zero exit that wasn't a wedge: real failure, don't loop
  exit "$rc"
done
echo "== retries exhausted" >> "$LOG"
exit 1
