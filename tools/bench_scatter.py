"""Microbenchmark of DCCL backward-scatter formulations on TPU.

Level-0 shapes (batch 4, Q=8192, Hl=64, Wl=128), both volumes, own+cross,
12 chained calls (amortises dispatch; mirrors the 12-iteration backward).

Variants:
- einsum_dense     : dense per-query one-hot einsum for own AND cross
                     (round-2 pre-kernel path)
- einsum_sep_own   : separable own-window scatter + dense cross
- kernel           : the fused Pallas scatter kernel (dccl_scatter)

Prints one JSON line per variant.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, Q, Hl, Wl = 4, 8192, 64, 128
K = 81
CHAIN = 12
DTYPE = jnp.bfloat16


def _one_hot_pair(coords, extent, wrap):
    t = coords % extent if wrap else coords
    t0 = jnp.floor(t)
    frac = t - t0
    if wrap:
        m0 = jnp.ones_like(frac)
        m1 = (t0 != extent - 1).astype(frac.dtype)
    else:
        m0 = ((t0 >= 0) & (t0 <= extent - 1)).astype(frac.dtype)
        m1 = ((t0 + 1 >= 0) & (t0 + 1 <= extent - 1)).astype(frac.dtype)
    i0 = jnp.clip(t0, 0, extent - 1).astype(jnp.int32)
    i1 = jnp.clip(t0 + 1, 0, extent - 1).astype(jnp.int32)
    return i0, i1, frac, m0, m1


def scatter_dense(g, tapx, tapy):
    x0, x1, fx, _, mx1 = _one_hot_pair(tapx, Wl, wrap=True)
    y0, y1, fy, my0, my1 = _one_hot_pair(tapy, Hl, wrap=False)
    cols_w = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, Wl), 3)
    cols_h = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, Hl), 3)
    wx = (jnp.where(cols_w == x0[..., None], (1 - fx)[..., None], 0.0)
          + jnp.where(cols_w == x1[..., None], (fx * mx1)[..., None], 0.0))
    wy = (jnp.where(cols_h == y0[..., None], (my0 * (1 - fy))[..., None], 0.0)
          + jnp.where(cols_h == y1[..., None], (my1 * fy)[..., None], 0.0))
    gwx = wx * g[..., None]
    dv = jnp.einsum("bqkh,bqkw->bqhw", wy.astype(DTYPE), gwx.astype(DTYPE),
                    preferred_element_type=jnp.float32)
    return dv.astype(DTYPE)


def _window_weights(centers, extent, radius, wrap):
    n = 2 * radius + 1
    t = centers % extent if wrap else centers
    t0 = jnp.floor(t)
    frac = (t - t0)[..., None, None]
    d = jnp.arange(n, dtype=jnp.float32) - radius
    base = t0[..., None] + d
    if wrap:
        base = base % extent
    cols = jax.lax.broadcasted_iota(jnp.float32, (n, extent), 1)
    base = base[..., None]
    return (jnp.where(cols == base, 1.0 - frac, 0.0) +
            jnp.where(cols == base + 1.0, frac, 0.0))


def scatter_sep_own(g, cen):
    gij = g.reshape(B, Q, 9, 9)
    wx = _window_weights(cen[..., 0], Wl, 4, True).astype(DTYPE)
    wy = _window_weights(cen[..., 1], Hl, 4, False).astype(DTYPE)
    tmp = jnp.einsum("bqjh,bqij->bqih", wy, gij.astype(DTYPE),
                     preferred_element_type=jnp.float32)
    dv = jnp.einsum("bqih,bqiw->bqhw", tmp.astype(DTYPE), wx,
                    preferred_element_type=jnp.float32)
    return dv.astype(DTYPE)


def own_taps(cen):
    kk = jnp.arange(K)
    ii = (kk // 9).astype(jnp.float32) - 4.0
    jj = (kk % 9).astype(jnp.float32) - 4.0
    return cen[..., 0:1] + ii, cen[..., 1:2] + jj


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    rng = np.random.default_rng(0)
    g_ownA = jnp.asarray(rng.normal(size=(B, Q, K)).astype(np.float32))
    g_crossB = jnp.asarray(rng.normal(size=(B, Q, K)).astype(np.float32))
    g_ownB = jnp.asarray(rng.normal(size=(B, Q, K)).astype(np.float32))
    g_crossA = jnp.asarray(rng.normal(size=(B, Q, K)).astype(np.float32))
    base = np.stack(np.meshgrid(np.arange(128), np.arange(64)), -1
                    ).reshape(-1, 2).astype(np.float32)
    cenA = jnp.asarray(np.tile(base[None], (B, 1, 1))
                       + rng.normal(scale=3, size=(B, Q, 2)).astype(np.float32))
    cenB = jnp.asarray(np.tile(base[None], (B, 1, 1))
                       + rng.normal(scale=3, size=(B, Q, 2)).astype(np.float32))
    crossA = jnp.asarray(rng.uniform(0, 127, (B, Q, K, 2)).astype(np.float32))
    crossB = jnp.asarray(rng.uniform(0, 127, (B, Q, K, 2)).astype(np.float32))

    def chain(one_call):
        def f(goa, gxa, gob, gxb):
            accA = accB = 0.0
            for i in range(CHAIN):
                dvA, dvB = one_call(goa + i * 1e-3, gxa, gob, gxb + i * 1e-3)
                accA = accA + dvA.astype(jnp.float32).sum()
                accB = accB + dvB.astype(jnp.float32).sum()
            return accA + accB
        return jax.jit(f)

    def dense_call(goa, gxa, gob, gxb):
        oax, oay = own_taps(cenA)
        obx, oby = own_taps(cenB)
        dvA = scatter_dense(goa, oax, oay) + scatter_dense(
            gxb, crossB[..., 0], crossB[..., 1])
        dvB = scatter_dense(gob, obx, oby) + scatter_dense(
            gxa, crossA[..., 0], crossA[..., 1])
        return dvA, dvB

    def sep_call(goa, gxa, gob, gxb):
        dvA = scatter_sep_own(goa, cenA) + scatter_dense(
            gxb, crossB[..., 0], crossB[..., 1])
        dvB = scatter_sep_own(gob, cenB) + scatter_dense(
            gxa, crossA[..., 0], crossA[..., 1])
        return dvA, dvB

    def kernel_call(goa, gxa, gob, gxb):
        from prior_flow_tpu.ops.pallas.dccl_gather import dccl_scatter
        return dccl_scatter(goa, gxa, gob, gxb, cenA, cenB, crossA, crossB,
                            Hl, Wl, 1.0, DTYPE)

    for name, call in [("einsum_dense", dense_call),
                       ("einsum_sep_own", sep_call),
                       ("kernel", kernel_call)]:
        try:
            f = chain(call)
            t0 = time.perf_counter()
            _ = float(f(g_ownA, g_crossA, g_ownB, g_crossB))
            comp = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                _ = float(f(g_ownA, g_crossA, g_ownB, g_crossB))
                ts.append(time.perf_counter() - t0)
            per_call = min(ts) / CHAIN * 1e3
            print(json.dumps({"variant": name,
                              "ms_per_iter_level0": round(per_call, 2),
                              "compile_s": round(comp, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name,
                              "error": f"{type(e).__name__}: {str(e)[:160]}"}),
                  flush=True)


if __name__ == "__main__":
    main()
