"""Microbench the static-resample transpose (`_bwd_apply`) at the shapes
the 512x1024 training step actually runs, on the real chip.

The round-4 trace attributed ~170 ms/step to static-resample CSR
transposes (docs/ARCHITECTURE.md §3). The per-step population:

- DCCL cross back-rotation transpose: grid b2a_8 / a2b_8 (64x128),
  payload (B, 64, 128, 324) f32 — 2 per iteration x 12 iterations;
- (the in-scan flo_rotate input is stop_gradiented, so its cycle_grid
  transpose does NOT run in the standard backward).

This harness times `_bwd_apply` per plan/payload, then per proposed
variant (degree bucketing / dtype), so the bucketing lever can be A/B'd
in isolation before touching the production plan.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=30, warmup=3):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        jax.block_until_ready(f(*args))
    # chain-free loop: these ops are big enough that dispatch overlap
    # doesn't distort at n=30
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--channels", type=int, default=324)
    args = ap.parse_args()

    from prior_flow_tpu.geometry.grids import rotation_grids
    from prior_flow_tpu.ops.static_resample import _bwd_apply, _get_plan

    B, C = args.batch, args.channels
    g = rotation_grids(512, 1024)
    plan = _get_plan(np.asarray(g.b2a_8), (64, 128), "cycle_bilinear")
    print(f"plan tier1 {plan.bwd_idx.shape} buckets "
          f"{[b[0].shape for b in plan.buckets]}")

    rng = np.random.default_rng(0)
    ct = jnp.asarray(rng.normal(size=(B, 64, 128, C)).astype(np.float32))

    ms = timeit(lambda x: _bwd_apply(plan, x), ct)
    print(f"_bwd_apply (B={B}, C={C} f32): {ms:.3f} ms/call "
          f"-> x24/step = {ms * 24:.1f} ms")

    ct16 = ct.astype(jnp.bfloat16)
    ms16 = timeit(lambda x: _bwd_apply(plan, x), ct16)
    print(f"_bwd_apply bf16 payload:       {ms16:.3f} ms/call "
          f"-> x24/step = {ms16 * 24:.1f} ms")

    # tier-1-only ablation (what do the overflow buckets cost?)
    import prior_flow_tpu.ops.static_resample as sr

    nh = object.__new__(sr._Plan)
    for s in sr._Plan.__slots__:
        setattr(nh, s, getattr(plan, s))
    nh.buckets = []
    ms_t1 = timeit(lambda x: _bwd_apply(nh, x), ct)
    print(f"tier-1 only (WRONG numerics, cost probe): {ms_t1:.3f} ms/call")


if __name__ == "__main__":
    main()
