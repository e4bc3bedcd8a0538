"""Headline benchmark: panoramic frame-pairs/sec, 512x1024, 12 GRU iters.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the reference publishes no throughput numbers. REF_FPS_RTX3090 is
a documented literature-derived estimate (see BASELINE.md "Baseline
methodology"): RAFT's published 10 FPS @ 1024x440 on a 1080 Ti, scaled by a
3090's ~2.2x advantage, the 1.16x pixel-count increase to 512x1024, and the
~3x cost of PriOr-RAFT over single-branch RAFT (dual branch + DCCL cross
lookups + per-call grid regeneration). A same-host CPU anchor is also
recorded in BASELINE.md (tools/bench_reference_cpu.py).
"""

from __future__ import annotations

import json
import time

REF_FPS_RTX3090 = 6.0  # derived estimate, band 4-8 (BASELINE.md)

H, W = 512, 1024
ITERS = 12
WARMUP = 2
RUNS = 12

# rough per-pair FLOP count of the compiled forward (encoders + volumes +
# 12 iterations of GRU/DCCL/upsampling), used only for the MFU estimate
APPROX_TFLOP_PER_PAIR = 1.9
V5E_PEAK_BF16_TFLOPS = 197.0


def main():
    import jax
    try:  # persistent compile cache: driver re-runs skip the long compile
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from prior_flow_tpu.models import PriOrRAFT

    model = PriOrRAFT(mixed_precision=True, lookup_mode="pallas")
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

    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        out = fwd(variables, img1, img2)
        _ = float(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    p90 = times[int(len(times) * 0.9)]

    fps = 1.0 / p50
    print(json.dumps({
        "metric": f"frame-pairs/sec @ {H}x{W}, {ITERS} GRU iters, bf16, 1 chip",
        "value": round(fps, 3),
        "unit": "pairs/s",
        "vs_baseline": round(fps / REF_FPS_RTX3090, 3),
        "p50_ms": round(p50 * 1e3, 1),
        "p90_ms": round(p90 * 1e3, 1),
        "mfu_est": round(APPROX_TFLOP_PER_PAIR * fps / V5E_PEAK_BF16_TFLOPS,
                         4),
        "baseline_note": "RTX3090 est 6.0 pairs/s, band 4-8 (BASELINE.md)",
    }))


if __name__ == "__main__":
    main()
