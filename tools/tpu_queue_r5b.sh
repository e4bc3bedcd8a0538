#!/bin/bash
# Round-5 queue B: chip measurements for the 2-D row-gather layout lever,
# the batch-6 FlowScape-recipe step, and the dual-methodology scale table.
# Usage: nohup bash tools/tpu_queue_r5b.sh > /tmp/tpu_queue_r5b.log 2>&1 &
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

echo "=== A/B: 2-D row-gather CSR transposes (vs 1843 ms baseline) ==="
timeout 2400 python tools/bench_train_step.py --train-only --policy dccl
echo "=== batch-6 step (FlowScape recipe) ==="
timeout 2400 python tools/bench_train_step.py --train-only --batch 6
echo "=== scale table (sync+sustained, 2048x4096 chunked onthefly) ==="
timeout 7200 python tools/bench_scale.py
echo "[queue] done $(date -u +%H:%M:%S)"
