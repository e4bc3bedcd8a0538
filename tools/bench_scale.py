"""Scale-story benchmark (VERDICT round 1, item 7).

Measures, on the real TPU chip:

1. 512x1024 forward, corr_mode='volume' (the headline config) — sanity
   anchor against bench.py;
2. 512x1024 forward, corr_mode='onthefly' — the memory-efficient exact
   path (capability of the reference's never-compiled alt_cuda_corr,
   core/corr.py:64-91);
3. 1024x2048 forward, corr_mode='onthefly' — the case the mode exists
   for: the materialised volume would be (2*128*256)^2 * 2 branches
   * 4 levels/3 ≈ 16x the 512x1024 footprint (~36 GB f32), beyond a
   v5e's 16 GB HBM; on-the-fly needs only the feature pyramids;
4. 1024x2048 forward, corr_mode='volume' in bf16 — expected to OOM or
   thrash; recorded as evidence, not a target.

Prints one JSON line per config. Run standalone on the chip.
"""

from __future__ import annotations

import json
import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP = 1
RUNS = 4


def bench_config(H, W, corr_mode, lookup_mode="pallas", runs=RUNS):
    """Returns (sync_p50_s, sustained_s).

    Two methodologies, both reported (VERDICT r4 item 7 — the round-4
    table's 6.8 pairs/s at 512x1024 vs bench.py's 9.4-9.6 was exactly
    this split, not a discrepancy):

    - sync_p50: one scalar fetch per forward — each frame pays a full
      host<->device tunnel round trip. Matches bench.py's
      ``latency_p50_ms`` (140.5 ms ~ 7.1 pairs/s on the round-4 record).
    - sustained: bench.py's headline method — ``runs`` forwards chained
      through a scalar data dependency, ONE final fetch, so dispatches
      overlap the device and the tunnel latency amortises away.
    """
    import jax
    import jax.numpy as jnp

    from prior_flow_tpu.models import PriOrRAFT

    model = PriOrRAFT(mixed_precision=True, corr_mode=corr_mode,
                      lookup_mode=lookup_mode)
    rng = jax.random.PRNGKey(0)
    img1 = jax.random.uniform(rng, (1, H, W, 3)) * 255.0
    img2 = jax.random.uniform(jax.random.fold_in(rng, 1), (1, H, W, 3)) * 255.0
    variables = model.init(rng, img1, img2, iters=1)
    fwd = jax.jit(lambda v, a, b, s: model.apply(
        v, a + s * 1e-30, b, iters=12, test_mode=True).sum())
    # s must be a STRONG-typed f32 device scalar in every call: the chained
    # loop feeds fwd's own f32[] output back in, and a weak-typed Python
    # 0.0 warmup would compile a SECOND graph and put the recompile inside
    # the timed loop (the first run of this script measured 13.4 s
    # "sustained" at 512x1024 — that was the compile, not the model)
    zero = jnp.zeros((), jnp.float32)
    for _ in range(WARMUP):
        float(fwd(variables, img1, img2, zero))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        _ = float(fwd(variables, img1, img2, zero))
        times.append(time.perf_counter() - t0)
    times.sort()
    sync_p50 = times[len(times) // 2]
    out = zero  # same f32[] aval as fwd's output -> one compiled graph
    t0 = time.perf_counter()
    for _ in range(max(runs, 4)):
        out = fwd(variables, img1, img2, out)
    _ = float(out)
    sustained = (time.perf_counter() - t0) / max(runs, 4)
    return sync_p50, sustained


def main():
    import argparse

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="run just one config, e.g. '2048x4096 onthefly' "
                         "(compute at that shape is ~16x the 1024x2048 "
                         "case — filter so a chip window isn't spent "
                         "re-measuring the settled rows)")
    ap.add_argument("--runs", type=int, default=RUNS)
    args = ap.parse_args()

    configs = [
        (512, 1024, "volume"),
        (512, 1024, "onthefly"),
        (1024, 2048, "onthefly"),
        # 4x the 1024x2048 pixel count: volume would need ~590 GB; the
        # pyramids fit in ~1.1 GB. Single-chip evidence that resolution
        # scaling is bounded by FLOPs, not by the correlation volume.
        (2048, 4096, "onthefly"),
    ]
    if args.only:
        configs = [(H, W, m) for H, W, m in configs
                   if f"{H}x{W} {m}" == args.only]
        assert configs or args.only == "1024x2048 volume", \
            f"unknown --only {args.only!r}"
    for H, W, mode in configs:
        try:
            p50, sus = bench_config(H, W, mode, runs=args.runs)
            print(json.dumps({
                "config": f"{H}x{W} {mode}",
                "sync_p50_ms": round(p50 * 1e3, 1),
                "sync_pairs_per_s": round(1.0 / p50, 3),
                "sustained_ms": round(sus * 1e3, 1),
                "pairs_per_s": round(1.0 / sus, 3)}), flush=True)
        except Exception as e:  # OOM etc. — record, keep going
            print(json.dumps({
                "config": f"{H}x{W} {mode}",
                "error": f"{type(e).__name__}: {str(e)[:200]}"}), flush=True)

    # evidence case: the materialised volume at 1024x2048 via the lean
    # chunked build
    if args.only and args.only != "1024x2048 volume":
        return
    try:
        p50, sus = bench_config(1024, 2048, "volume", runs=2)
        print(json.dumps({"config": "1024x2048 volume",
                          "sync_p50_ms": round(p50 * 1e3, 1),
                          "sustained_ms": round(sus * 1e3, 1),
                          "pairs_per_s": round(1.0 / sus, 3)}), flush=True)
    except Exception as e:
        print(json.dumps({"config": "1024x2048 volume",
                          "error": f"{type(e).__name__}: {str(e)[:200]}"}),
              flush=True)


if __name__ == "__main__":
    main()
