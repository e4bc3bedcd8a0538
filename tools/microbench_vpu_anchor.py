"""Measured VPU anchors for the DCCL forward roofline (ARCHITECTURE §7).

The DCCL kernel is VPU-bound (its HBM traffic is ~9% of bandwidth); its
inner structure is forced by a v5e hardware limit — no multi-vreg sublane
dynamic gather — into lane gathers + a binary row-select (where) network.
The analytic floor therefore needs the chip's ACHIEVED throughput on
exactly those primitives, not a datasheet number. This measures:

1. select chain: jnp.where(mask, a, b) chained K deep on a VMEM-resident
   (8192, 128) f32 tile -> element-ops/s;
2. lane gather chain: take_along_axis permutations of the lane axis on
   (8192, 128) -> gathered elements/s;
3. fused mul-add chain (the bilinear blend arithmetic).

Each chain is jitted as ONE graph (K sequential data-dependent ops, no
dead-code elimination possible) and timed over the whole graph.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS, LANES, K = 8192, 128, 256


def timeit(f, *args, n=20):
    out = f(*args)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(ROWS, LANES)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(ROWS, LANES)).astype(np.float32))
    m = jnp.asarray(rng.integers(0, 2, size=(ROWS, LANES)).astype(bool))
    idx = jnp.asarray(rng.integers(0, LANES, size=(ROWS, LANES)
                                   ).astype(np.int32))

    @jax.jit
    def select_chain(a, b, m):
        x = a
        for _ in range(K):
            x = jnp.where(m, x, b)
            b, x = x, b  # data dependence, no folding
        return x

    @jax.jit
    def gather_chain(a, idx):
        x = a
        for _ in range(K):
            x = jnp.take_along_axis(x, idx, axis=1) + 1.0
        return x

    @jax.jit
    def fma_chain(a, b):
        x = a
        for _ in range(K):
            x = x * b + a
        return x

    n_elem = ROWS * LANES * K
    for name, f, args in (("select", select_chain, (a, b, m)),
                          ("lane-gather", gather_chain, (a, idx)),
                          ("fma", fma_chain, (a, b))):
        t = timeit(f, *args)
        print(f"{name:>12}: {t * 1e3:8.3f} ms for {K} chained ops on "
              f"({ROWS},{LANES}) f32 -> {n_elem / t / 1e12:6.3f} T elem-ops/s")


if __name__ == "__main__":
    main()
