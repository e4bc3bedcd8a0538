"""Measured VPU anchors for the DCCL forward roofline (ARCHITECTURE §7).

The DCCL kernel is VPU-bound (its HBM traffic is ~9% of bandwidth); its
inner structure is forced by a v5e hardware limit — no multi-vreg sublane
dynamic gather — into lane gathers + a binary row-select (where) network.
The analytic floor therefore needs the chip's ACHIEVED throughput on
exactly those primitives.

The round-4 version of this file chained jnp ops under plain XLA and
measured ~0.083 T elem-ops/s for select — that number is HBM BANDWIDTH
(256 un-fused chain steps x 3 x 4 MB arrays / 3.2 ms = ~1 TB/s), not VPU
throughput: XLA materialises every chain step. These anchors run INSIDE
a Pallas kernel on VMEM-resident (512, 128) f32 tiles, exactly like the
production kernel's working set, so the loop never touches HBM:

1. select: y = where(mask_k, x, y) chained K deep — the row-select
   halving network's primitive (1 select element-op per element);
2. lane gather: y = take_along_axis(y, idx, axis=1) chained K deep —
   tpu.dynamic_gather along lanes, the corner-fetch primitive;
3. fma: y = y * a + b chained K deep — the bilinear blend arithmetic.

Each chain step depends on the previous result, so Mosaic cannot fold or
hoist; the kernel body is ONE fori_loop with static trip count.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TILE_R, LANES = 512, 128   # (512, 128) f32 = 256 KB VMEM per buffer
K = 256                    # chained ops per kernel instance
GRID = 128                 # instances -> GRID*TILE_R*LANES*K element-ops
INTERPRET = bool(int(os.environ.get("ANCHOR_INTERPRET", "0")))  # CPU smoke


def _kernel(x_ref, i_ref, o_ref, *, kind, ilp):
    """``ilp`` independent chains of K ops each. ilp=1 measures the
    latency-bound rate (strict serial dependence); ilp=4 exposes the
    instruction-level parallelism the production kernel's 4 concurrent
    corner picks have, approaching the primitive's throughput limit. The
    roofline floor divides by the BEST measured rate (conservative)."""
    x = x_ref[...]
    idx = i_ref[...]

    if kind == "select":
        def step(k, y, j):
            bit = (idx & (1 + ((k + j) % 7))) != 0
            return jnp.where(bit, x, y)
    elif kind == "gather":
        def step(k, y, j):
            return jnp.take_along_axis(y, idx, axis=1)
    elif kind == "fma":
        def step(k, y, j):
            return y * x + x
    else:
        raise ValueError(kind)

    def body(k, ys):
        return tuple(step(k, y, j) for j, y in enumerate(ys))

    init = tuple(x * (0.5 + 0.1 * j) for j in range(ilp))
    ys = jax.lax.fori_loop(0, K // ilp, body, init)
    out = ys[0]
    for y in ys[1:]:
        out = out + y
    o_ref[...] = out


def _build(kind, ilp=1):
    spec = pl.BlockSpec((TILE_R, LANES), lambda g: (g, 0))
    return pl.pallas_call(
        functools.partial(_kernel, kind=kind, ilp=ilp),
        grid=(GRID,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((GRID * TILE_R, LANES), jnp.float32),
        interpret=INTERPRET,
    )


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0


def _build_step_cost(grid):
    """Near-empty kernel over ``grid`` steps on one (8, 128) tile each:
    isolates the per-grid-step fixed cost (DMA issue, semaphores, loop
    bookkeeping) that the flat per-level kernel profile points at
    (19.4/15.2/13.1/8.3 ms/forward while volumes shrink 4x per level)."""
    spec = pl.BlockSpec((8, LANES), lambda g: (g, 0))
    return pl.pallas_call(
        _copy_kernel,
        grid=(grid,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((grid * 8, LANES), jnp.float32),
        interpret=INTERPRET,
    )


def timeit(f, *args, n=10):
    out = f(*args)
    _ = float(jnp.sum(out[:1]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _ = float(jnp.sum(out[:1]))
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(GRID * TILE_R, LANES)
                               ).astype(np.float32))
    # a lane permutation per row (gather), doubles as the bit-test ints
    idx = jnp.asarray(np.argsort(
        rng.random((GRID * TILE_R, LANES)), axis=1).astype(np.int32))

    n_elem = GRID * TILE_R * LANES * K
    for kind in ("select", "gather", "fma"):
        for ilp in (1, 4):
            f = jax.jit(_build(kind, ilp))
            t = timeit(f, x, idx)
            print(f"{kind:>8} ilp={ilp}: {t * 1e3:8.3f} ms for "
                  f"{K // ilp * ilp} ops x {GRID}x({TILE_R},{LANES}) f32 "
                  f"tiles -> {n_elem / t / 1e12:6.3f} T elem-ops/s",
                  flush=True)

    # per-grid-step fixed cost: slope of time vs grid steps
    g1, g2 = 512, 4096
    xs = jnp.asarray(rng.normal(size=(g2 * 8, LANES)).astype(np.float32))
    t1 = timeit(jax.jit(_build_step_cost(g1)), xs[:g1 * 8])
    t2 = timeit(jax.jit(_build_step_cost(g2)), xs)
    per_step = (t2 - t1) / (g2 - g1)
    print(f"grid-step: {per_step * 1e6:8.3f} us fixed cost per step "
          f"(slope {g1}->{g2} steps; {t1 * 1e3:.3f} -> {t2 * 1e3:.3f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
