#!/bin/sh
# Round-5 closing chip work, restart-safe (the A/B battery is done and
# recorded; this finishes VERDICT r04 #6 + the bench refresh):
#   1. matched-bitrate parity bisection per demo content (cache is
#      repo-local, so flaps/restarts only cost the eval in flight)
#   2. fresh bench.py capture (refreshes BENCH_LAST_GOOD.json with the
#      r5 defaults: knn v2 + device-upscaled realistic point)
# Parity runs FIRST: the driver captures BENCH_r05 itself at round end,
# but nothing else produces the matched-bitrate point.
#
#   nohup sh scripts/r5_finish.sh > /tmp/r5_finish.log 2>&1 &
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
probe() {
  timeout 90 python3 -c "import jax, jax.numpy as jnp; print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))" >/dev/null 2>&1
}

for c in city football; do
  n=0
  while [ "$n" -lt 30 ]; do
    if probe; then
      echo "$(date -u +%H:%M:%S) parity_matched $c (attempt $((n + 1)))" >&2
      if timeout 5400 python3 "$ROOT/scripts/parity_matched.py" "$c" \
          >> /tmp/parity_matched.log 2>&1; then
        echo "$(date -u +%H:%M:%S) parity_matched $c done" >&2
        break
      fi
      echo "$(date -u +%H:%M:%S) parity_matched $c failed; retrying" >&2
    else
      echo "$(date -u +%H:%M:%S) tunnel down" >&2
    fi
    n=$((n + 1))
    sleep 90
  done
done
touch /tmp/parity.done

echo "$(date -u +%H:%M:%S) parity phase over; running bench.py" >&2
# bench.py probe-gates itself and waits for tunnel recovery internally
timeout 5400 python3 "$ROOT/bench.py" > /tmp/bench_r5.log 2>&1
echo "$(date -u +%H:%M:%S) bench rc=$? (log /tmp/bench_r5.log)" >&2
touch /tmp/r5_finish.done
echo "$(date -u +%H:%M:%S) chain complete" >&2
