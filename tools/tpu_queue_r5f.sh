#!/bin/bash
# Round-5 queue F: after queue E (waits for its pid), (1) sanity-check the
# FIXED bench_scale at the headline config — must reproduce bench.py's
# ~9.5 sustained — and (2) refresh the per-stage forward profile that
# backs ARCHITECTURE's forward-budget table (last captured at the 8.95
# pairs/s state).
# Usage: nohup bash tools/tpu_queue_r5f.sh <wait_pid> > /tmp/tpu_queue_r5f.log 2>&1 &
set -u
cd /root/repo

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "[queue] waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

healthy() {
  timeout 240 python - <<'EOF' >/dev/null 2>&1
import time, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
x = jax.random.uniform(jax.random.PRNGKey(0), (1, 256, 512, 64))
k = jax.random.uniform(jax.random.PRNGKey(1), (3, 3, 64, 64))
f = jax.jit(lambda x, k: jax.lax.conv_general_dilated(
    x, k, (1, 1), 'SAME',
    dimension_numbers=('NHWC', 'HWIO', 'NHWC')).sum())
float(f(x, k))
t0 = time.time()
for _ in range(3):
    r = float(f(x, k))
assert (time.time() - t0) / 3 < 4.0
EOF
}

until healthy; do
  echo "[queue] tunnel degraded/down $(date -u +%H:%M:%S); retry in 120s"
  sleep 120
done
echo "=== fixed bench_scale sanity @ headline config ==="
timeout 1800 python tools/bench_scale.py --only "512x1024 volume" --runs 6
until healthy; do
  echo "[queue] tunnel degraded/down $(date -u +%H:%M:%S); retry in 120s"
  sleep 120
done
echo "=== per-stage forward re-profile ==="
timeout 2400 python tools/profile_tpu.py
echo "[queue] done $(date -u +%H:%M:%S)"
