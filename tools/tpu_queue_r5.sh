#!/bin/bash
# Round-5 TPU measurement queue: waits for the tunnel, then runs the
# queued chip measurements serially with the host otherwise idle.
# Usage: nohup bash tools/tpu_queue_r5.sh > /tmp/tpu_queue_r5.log 2>&1 &
set -u
cd /root/repo

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((1024, 1024))
assert float((x @ x).sum()) > 0
EOF
}

echo "[queue] probing tunnel..."
until probe; do
  echo "[queue] tunnel down $(date -u +%H:%M:%S); retry in 60s"
  sleep 60
done
echo "[queue] tunnel UP $(date -u +%H:%M:%S)"

echo "=== A/B: PATCH=0 (dense scatter, bucketed CSR) ==="
PRIORFLOW_SCATTER_PATCH=0 timeout 1800 python tools/bench_train_step.py --train-only --policy dccl
echo "=== A/B: PATCH=48 (patch-local scatter, default) ==="
PRIORFLOW_SCATTER_PATCH=48 timeout 1800 python tools/bench_train_step.py --train-only --policy dccl
echo "=== bench.py (warms driver cache; batch4 secondary) ==="
timeout 2400 python bench.py
echo "=== VPU anchors (analytic bound) ==="
timeout 900 python tools/microbench_vpu_anchor.py
echo "[queue] done $(date -u +%H:%M:%S)"
