#!/bin/bash
# Round-5 queue G: isolate the 2048x4096 onthefly TPU-worker crash.
#
# The lax.map query-chunked onthefly path (round-5 compile fix) has never
# executed on real TPU: round-4's 1024x2048 onthefly number predates
# chunking, and Q=32768 now ALSO takes the chunked path. A worker crash at
# 2048x4096 (2x observed, kills the worker for ~15 min) could be the
# chunk path itself or the 4x size. Bisect small-to-large so a crash
# costs the least:
#   1. 512x1024 onthefly with a FORCED small chunk (Q=8192, 2 chunks) —
#      pure chunk-path test at the cheapest shape;
#   2. 1024x2048 onthefly (auto-chunked now) — the shipped escape hatch;
#   3. only if both pass: 2048x4096 again.
# Usage: nohup bash tools/tpu_queue_r5g.sh > /tmp/tpu_queue_r5g.log 2>&1 &
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
echo "=== step 1: chunk path at 512x1024 (forced 2 chunks) ==="
timeout 1800 python - <<'EOF'
import time, jax, jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
from prior_flow_tpu.ops import corr as C
C.DCCLOnTheFly.QUERY_CHUNK_AUTO = 4096  # force the lax.map path: Q=8192 -> 2 chunks
from prior_flow_tpu.models import PriOrRAFT
model = PriOrRAFT(mixed_precision=True, corr_mode="onthefly")
rng = jax.random.PRNGKey(0)
a = jax.random.uniform(rng, (1, 512, 1024, 3)) * 255.0
b = jax.random.uniform(jax.random.fold_in(rng, 1), (1, 512, 1024, 3)) * 255.0
v = model.init(rng, a, b, iters=1)
f = jax.jit(lambda v, a, b: model.apply(v, a, b, iters=12, test_mode=True).sum())
t0 = time.time(); r = float(f(v, a, b))
print(f"chunked 512x1024 onthefly OK: {r:.3f} first-call {time.time()-t0:.1f}s", flush=True)
t0 = time.time(); r = float(f(v, a, b))
print(f"second call {time.time()-t0:.1f}s", flush=True)
EOF
echo "step1 rc=$?"

wait_healthy
echo "=== step 2: 1024x2048 onthefly (auto-chunked) ==="
timeout 3600 python tools/bench_scale.py --only "1024x2048 onthefly" --runs 2
echo "step2 rc=$?"

wait_healthy
echo "=== step 3: 2048x4096 onthefly ==="
timeout 5400 python tools/bench_scale.py --only "2048x4096 onthefly" --runs 2
echo "step3 rc=$?"
echo "[queue] done $(date -u +%H:%M:%S)"
