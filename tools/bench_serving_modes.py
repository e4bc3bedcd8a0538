"""Serving-mode throughput: the opt-in protocol trades (ARCHITECTURE §7).

The parity protocol (12 GRU iterations, cold init) is the bench.py
headline and the default everywhere. §7 derives that its lookup runs at
the measured-primitive floor — further throughput on this silicon must
come from changing the PROTOCOL. This measures the two opt-ins the
framework already ships:

- fewer iterations (``--iters`` on every CLI): the scan is linear in
  iters beyond the fixed encoder cost;
- warm start (``cli/video.py --warm_start``, the reference's legacy RAFT
  sequence protocol, evaluate.py:30-37): the previous pair's flow
  forward-splatted as init, which is what makes a reduced-iteration
  count usable on video.

Reported: sustained pairs/s per iteration count (chained dispatch, one
fetch, bench.py's method). The ACCURACY side of the trade needs trained
weights and real sequences (externally blocked, BASELINE.md §substitute
oracle); until then reduced-iteration serving is documented as opt-in
only — the parity protocol stays the default and the headline.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, "/root/repo")

from prior_flow_tpu.models import PriOrRAFT  # noqa: E402
from prior_flow_tpu.ops.warp import downflow8  # noqa: E402

H, W = 512, 1024
WARMUP = 2
RUNS = 8


def main():
    model = PriOrRAFT(mixed_precision=True)
    rng = jax.random.PRNGKey(0)
    img1 = jax.random.uniform(rng, (1, H, W, 3)) * 255.0
    img2 = jax.random.uniform(jax.random.fold_in(rng, 1),
                              (1, H, W, 3)) * 255.0
    variables = model.init(rng, img1, img2, iters=1)
    init0 = jnp.zeros((1, H // 8, W // 8, 2), jnp.float32)

    for iters in (12, 8, 6, 4):
        # warm-start-shaped graph: takes and returns the 1/8-res flow, so
        # the chained loop IS the video warm-start dataflow (each call's
        # init is the previous call's output, all on device)
        def _call(v, a, b, f, iters=iters):
            up = model.apply(v, a, b, iters=iters, init_flow=f,
                             test_mode=True)
            return up, downflow8(up)  # (full-res, 1/8-res warm init)

        fwd = jax.jit(_call)
        try:
            up, low = fwd(variables, img1, img2, init0)
            jax.block_until_ready(low)
            _ = float(up.sum())
            for _ in range(WARMUP):
                up, low = fwd(variables, img1, img2, low)
                _ = float(up.sum())
            t0 = time.perf_counter()
            for _ in range(RUNS):
                up, low = fwd(variables, img1, img2, low)
            _ = float(up.sum())
            per = (time.perf_counter() - t0) / RUNS
            print(json.dumps({
                "mode": f"iters={iters} warm-start chained",
                "sustained_ms": round(per * 1e3, 1),
                "pairs_per_s": round(1.0 / per, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"mode": f"iters={iters}",
                              "error": f"{type(e).__name__}: "
                                       f"{str(e)[:200]}"}), flush=True)

    # Batch axis: multi-stream serving (N independent pairs per dispatch).
    # Amortises per-dispatch overhead and batches the conv stack; the DCCL
    # kernel's grid is B*Q tiles so its per-pair cost is flat by
    # construction — any delta is conv/dispatch amortisation vs HBM
    # pressure. Batch 1 is the headline protocol; this quantifies what a
    # serving fleet gains (or loses) by batching streams per chip.
    for batch in (2, 4):
        for iters in (12, 6):
            def _callb(v, a, b, s, iters=iters):
                return model.apply(v, a + s * jnp.float32(1e-30), b,
                                   iters=iters, test_mode=True).sum()

            fwdb = jax.jit(_callb)
            try:
                a = jnp.tile(img1, (batch, 1, 1, 1))
                b = jnp.tile(img2, (batch, 1, 1, 1))
                zero = jnp.float32(0.0)
                for _ in range(WARMUP):
                    _ = float(fwdb(variables, a, b, zero))
                t0 = time.perf_counter()
                out = zero
                for _ in range(RUNS):
                    out = fwdb(variables, a, b, out)
                _ = float(out)
                per = (time.perf_counter() - t0) / RUNS / batch
                print(json.dumps({
                    "mode": f"batch={batch} iters={iters} chained",
                    "sustained_ms_per_pair": round(per * 1e3, 1),
                    "pairs_per_s": round(1.0 / per, 3)}), flush=True)
            except Exception as e:
                print(json.dumps({"mode": f"batch={batch} iters={iters}",
                                  "error": f"{type(e).__name__}: "
                                           f"{str(e)[:200]}"}), flush=True)


if __name__ == "__main__":
    main()
