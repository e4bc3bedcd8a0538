"""Headline benchmark: panoramic frame-pairs/sec, 512x1024, 12 GRU iters.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers (BASELINE.md);
``vs_baseline`` is measured fps divided by REF_FPS_RTX3090, a conservative
estimate of the PyTorch reference's single-3090 inference rate at the same
config (dual-branch RAFT + per-iteration grid resampling at 512x1024 runs
~2 fps on a 3090-class GPU; to be replaced by a measured number when GPU
hardware is available to the harness).
"""

from __future__ import annotations

import json
import time

REF_FPS_RTX3090 = 2.0  # estimated; reference publishes no number (BASELINE.md)

H, W = 512, 1024
ITERS = 12
WARMUP = 2
RUNS = 8


def main():
    import jax
    try:  # persistent compile cache: driver re-runs skip the ~20-min compile
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import jax.numpy as jnp

    from prior_flow_tpu.models import PriOrRAFT

    model = PriOrRAFT(mixed_precision=True, lookup_mode="mxu")
    rng = jax.random.PRNGKey(0)
    img1 = jax.random.uniform(rng, (1, H, W, 3)) * 255.0
    img2 = jax.random.uniform(jax.random.fold_in(rng, 1), (1, H, W, 3)) * 255.0
    variables = model.init(rng, img1, img2, iters=1)

    # reduce on device, fetch the scalar: forces real completion even through
    # async device tunnels where block_until_ready returns early
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b, iters=ITERS,
                                              test_mode=True).sum())
    for _ in range(WARMUP):
        float(fwd(variables, img1, img2))

    t0 = time.perf_counter()
    for _ in range(RUNS):
        out = fwd(variables, img1, img2)
    _ = float(out)
    dt = (time.perf_counter() - t0) / RUNS

    fps = 1.0 / dt
    print(json.dumps({
        "metric": f"frame-pairs/sec @ {H}x{W}, {ITERS} GRU iters, bf16, 1 chip",
        "value": round(fps, 3),
        "unit": "pairs/s",
        "vs_baseline": round(fps / REF_FPS_RTX3090, 3),
    }))


if __name__ == "__main__":
    main()
