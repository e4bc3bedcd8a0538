#!/bin/bash
# Round-5 queue C: wait out a tunnel outage, then (1) re-run the headline
# bench so both graphs land in the persistent compile cache for the
# driver's end-of-round run, (2) measure batched serving throughput.
# Usage: nohup bash tools/tpu_queue_r5c.sh > /tmp/tpu_queue_r5c.log 2>&1 &
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

echo "=== bench.py (batch-1 + batch-4, warms driver cache) ==="
timeout 1800 python bench.py
echo "=== serving-mode sweep with batch axis ==="
timeout 2400 python tools/bench_serving_modes.py
echo "[queue] done $(date -u +%H:%M:%S)"
