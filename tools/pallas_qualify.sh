#!/bin/bash
# Watchdog-guarded Pallas hardware qualification (VERDICT r2 task 2).
# Each stage runs in its own subprocess under a hard timeout; between stages
# the device is health-checked with a tiny matmul (a wedged tunnel recovers in
# ~60s). Output is designed to survive killed children (line-buffered grep).
cd "$(dirname "$0")/.." || exit 1

wait_healthy() {
  for _ in $(seq 1 12); do
    out=$(timeout 60 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256)) @ jnp.ones((256,256))
print('HEALTHY', float(jnp.sum(x)))" 2>/dev/null | grep -a HEALTHY | tail -1)
    if [ -n "$out" ]; then echo "health: $out"; return 0; fi
    echo "health: device busy/wedged, waiting 30s..."
    sleep 30
  done
  echo "health: DEVICE NEVER RECOVERED"
  return 1
}

export PYTHONPATH="$PWD:${PYTHONPATH}"  # zutis_tpu importable from tools/

for stage in "$@"; do
  wait_healthy || exit 1
  echo "=== stage $stage (timeout 420s) ==="
  timeout 420 stdbuf -oL python tools/pallas_qualify.py "$stage" 2>&1 \
    | grep --line-buffered -a -E 'RESULT|backend|stage'
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "RESULT_FAIL stage=$stage rc=$rc (timeout/wedge)"
  fi
done
wait_healthy
