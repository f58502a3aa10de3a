#!/bin/sh
# Round-5 chip work chain, run AFTER the A/B battery finishes:
#   1. fresh bench.py capture (refreshes BENCH_LAST_GOOD.json with the
#      r5 additions: device-upscaled realistic point + multi-KF point)
#   2. matched-bitrate parity bisection per demo content (VERDICT r04
#      #6) — parity_matched.py caches every (content, q) eval, so a
#      tunnel flap mid-bisection only costs the eval in flight.
#
#   nohup sh scripts/r5_chain.sh > /tmp/r5_chain.log 2>&1 &
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
probe() {
  timeout 90 python3 -c "import jax, jax.numpy as jnp; print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))" >/dev/null 2>&1
}

echo "$(date -u +%H:%M:%S) waiting for battery (/tmp/playbook.done)" >&2
while [ ! -e /tmp/playbook.done ]; do sleep 60; done

echo "$(date -u +%H:%M:%S) battery done; running bench.py" >&2
# bench.py probe-gates itself and waits for tunnel recovery internally
timeout 5400 python3 "$ROOT/bench.py" > /tmp/bench_r5.log 2>&1
echo "$(date -u +%H:%M:%S) bench rc=$? (log /tmp/bench_r5.log)" >&2

for c in city football; do
  n=0
  while [ "$n" -lt 20 ]; do
    if probe; then
      echo "$(date -u +%H:%M:%S) parity_matched $c (attempt $((n + 1)))" >&2
      if timeout 7200 python3 "$ROOT/scripts/parity_matched.py" "$c" \
          >> /tmp/parity_matched.log 2>&1; then
        echo "$(date -u +%H:%M:%S) parity_matched $c done" >&2
        break
      fi
      echo "$(date -u +%H:%M:%S) parity_matched $c failed; retrying" >&2
    else
      echo "$(date -u +%H:%M:%S) tunnel down" >&2
    fi
    n=$((n + 1))
    sleep 120
  done
done
touch /tmp/r5_chain.done
echo "$(date -u +%H:%M:%S) chain complete" >&2
