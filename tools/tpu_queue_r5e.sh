#!/bin/bash
# Round-5 queue E: the 2048x4096 chunked-onthefly measurement — the one
# scale-table row without a hardware number (VERDICT r4 item 6a). Health-
# gated like queue D; compile of this graph goes through the remote
# helper and can take 10-25 min, and each forward is ~16x the 1024x2048
# compute, so runs=2.
# Usage: nohup bash tools/tpu_queue_r5e.sh > /tmp/tpu_queue_r5e.log 2>&1 &
set -u
cd /root/repo

healthy() {
  timeout 240 python - <<'EOF' >/dev/null 2>&1
import time, jax, jax.numpy as jnp
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
per = (time.time() - t0) / 3
# 4 s tolerates host-side contention (pytest on the 1-core host shares
# the serialization path); a truly degraded tunnel measures 30-100 s
assert per < 4.0, f"tunnel degraded: {per:.1f}s/dispatch"
EOF
}

for attempt in $(seq 1 10); do
  until healthy; do
    echo "[queue] tunnel degraded/down $(date -u +%H:%M:%S); retry in 120s"
    sleep 120
  done
  echo "[queue] tunnel healthy $(date -u +%H:%M:%S); attempt $attempt"
  timeout 5400 python tools/bench_scale.py --only "2048x4096 onthefly" \
      --runs 2 | tee /tmp/scale_2048.json
  if grep -q "sustained_ms" /tmp/scale_2048.json; then
    echo "[queue] measured at $(date -u +%H:%M:%S)"
    break
  fi
  echo "[queue] attempt $attempt failed (window closed?); re-probing"
done
echo "[queue] done $(date -u +%H:%M:%S)"
