#!/bin/bash
# Round-5 queue H: 2048x4096 crash culprit test — rerun with the Pallas
# instance-norm kill switch (PRIORFLOW_NO_PALLAS_NORM=1, pure-XLA norms).
# If this completes, the worker crash is the norm kernel at a full-res
# shape; if it still crashes, the kernel is exonerated and the limitation
# note stands as written. Then (tunnel permitting) the fixed-bench_scale
# 512x1024 sanity row.
# Usage: nohup bash tools/tpu_queue_r5h.sh > /tmp/tpu_queue_r5h.log 2>&1 &
set -u
cd /root/repo

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

wait_healthy() {
  until healthy; do
    echo "[queue] tunnel degraded/down $(date -u +%H:%M:%S); retry in 120s"
    sleep 120
  done
  echo "[queue] tunnel healthy $(date -u +%H:%M:%S)"
}

wait_healthy
echo "=== 2048x4096 onthefly, XLA norms (no Pallas instance norm) ==="
PRIORFLOW_NO_PALLAS_NORM=1 timeout 5400 python tools/bench_scale.py \
    --only "2048x4096 onthefly" --runs 1
echo "step rc=$?"

wait_healthy
echo "=== fixed bench_scale sanity @ 512x1024 volume ==="
timeout 1800 python tools/bench_scale.py --only "512x1024 volume" --runs 6
echo "[queue] done $(date -u +%H:%M:%S)"
