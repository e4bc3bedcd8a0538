"""Split the DCCL grid kernel's per-level cost into its three stages.

The round-4 tile sweep (tools/tune_dccl_tile.py) measured per-level kernel
cost nearly FLAT across pyramid levels (1.64/1.30/1.12/0.72 ms per call at
512x1024) while volumes shrink 4x per level — so a level-size-independent
stage dominates the upper levels. The candidates, per level call:

- OWN sampling: 2 x (_own_taps + _sample_taps) over the two volumes;
- CROSS sampling: 2 x _sample_taps at arbitrary (grid-mapped) coords;
- GRID WINDOW: 2 x _grid_window — strip matmul + 9-step j-loop of lane
  gathers, whose cost is independent of the level's volume size.

This tool times tool-local kernel variants that run each stage in
isolation (plus the shipped grid/planes kernels as anchors), with the
in-jit lax.scan method (tools/_timing.py) so the axon tunnel does not
re-ship the 134 MB volumes per repetition.

    python tools/microbench_kernel_split.py
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools._timing import timed_scan

H, W = 512, 1024
LANES = 128


def _variant_call(kern_body, n_out, pA, pB, cenA, cenB, gcatA, gcatB,
                  T, R, Hl, Wl, Hg, Wg, scale):
    """pallas_call plumbing shared by the tool-local stage kernels."""
    BQ = pA.shape[0]
    kern = functools.partial(kern_body, T=T, R=R, Hl=Hl, Wl=Wl, Hg=Hg,
                             Wg=Wg, scale=scale)
    row = lambda q: (q, 0)
    vol3 = lambda q: (q, 0, 0)
    const2 = lambda q: (0, 0)
    return pl.pallas_call(
        kern,
        grid=(BQ // T,),
        in_specs=[
            pl.BlockSpec((T, 2), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 2), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hg, 2 * LANES), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hg, 2 * LANES), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, R, LANES), vol3, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, R, LANES), vol3, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((T, LANES), row, memory_space=pltpu.VMEM)
            for _ in range(n_out)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((BQ, LANES), jnp.float32)
            for _ in range(n_out)),
    )(cenA, cenB, gcatA, gcatB, pA, pB)


def _own_only_kernel(cenA_ref, cenB_ref, gA_ref, gB_ref, volA_ref, volB_ref,
                     ownA_ref, ownB_ref, *, T, R, Hl, Wl, Hg, Wg, scale):
    from prior_flow_tpu.ops.pallas.dccl_gather import _own_taps, _sample_taps
    VA = volA_ref[:].reshape(T * R, LANES)
    VB = volB_ref[:].reshape(T * R, LANES)
    ax, ay = _own_taps(cenA_ref[:], scale)
    ownA_ref[:] = _sample_taps(VA, T, R, Hl, Wl, ax, ay)
    bx, by = _own_taps(cenB_ref[:], scale)
    ownB_ref[:] = _sample_taps(VB, T, R, Hl, Wl, bx, by)


def _gridwin_only_kernel(cenA_ref, cenB_ref, gA_ref, gB_ref, volA_ref,
                         volB_ref, cAx_ref, cAy_ref, cBx_ref, cBy_ref,
                         *, T, R, Hl, Wl, Hg, Wg, scale):
    from prior_flow_tpu.ops.pallas.dccl_gather import _grid_window
    cAx, cAy = _grid_window(gA_ref[:], cenA_ref[:], T, Hg, Wg, scale)
    cBx, cBy = _grid_window(gB_ref[:], cenB_ref[:], T, Hg, Wg, scale)
    cAx_ref[:] = cAx
    cAy_ref[:] = cAy
    cBx_ref[:] = cBx
    cBy_ref[:] = cBy


def _cross_only_kernel(cenA_ref, cenB_ref, gA_ref, gB_ref, volA_ref,
                       volB_ref, crossA_ref, crossB_ref,
                       *, T, R, Hl, Wl, Hg, Wg, scale):
    from prior_flow_tpu.ops.pallas.dccl_gather import (_grid_window,
                                                       _sample_taps)
    VA = volA_ref[:].reshape(T * R, LANES)
    VB = volB_ref[:].reshape(T * R, LANES)
    cAx, cAy = _grid_window(gA_ref[:], cenA_ref[:], T, Hg, Wg, scale)
    crossA_ref[:] = _sample_taps(VB, T, R, Hl, Wl, cAx, cAy)
    cBx, cBy = _grid_window(gB_ref[:], cenB_ref[:], T, Hg, Wg, scale)
    crossB_ref[:] = _sample_taps(VA, T, R, Hl, Wl, cBx, cBy)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from prior_flow_tpu.geometry.grids import rotation_grids, identity_grid
    from prior_flow_tpu.ops.pallas import dccl_gather as dg

    h8, w8 = H // 8, W // 8
    Q = h8 * w8
    rg = rotation_grids(H, W)
    gA = jnp.asarray(rg.a2b_w2c_8, jnp.float32)
    gB = jnp.asarray(rg.b2a_w2c_8, jnp.float32)
    gcatA = dg.pack_grid_planes(gA)
    gcatB = dg.pack_grid_planes(gB)
    Hg, Wg = gA.shape[:2]

    rng = jax.random.PRNGKey(0)
    cen = jnp.asarray(identity_grid(h8, w8), jnp.float32).reshape(1, Q, 2)
    cen2 = cen.reshape(Q, 2)

    for lvl in range(4):
        Hl, Wl = h8 // (2 ** lvl), w8 // (2 ** lvl)
        scale = 1.0 / (2 ** lvl)
        vol = jax.random.normal(jax.random.fold_in(rng, lvl),
                                (1, Q, Hl, Wl), jnp.bfloat16)
        pA, mA = dg.pack_volume(vol)
        pB, mB = dg.pack_volume(vol)
        R = pA.shape[1]
        T = dg._pick_tile(Q, R, budget=dg.GRID_VMEM_BUDGET, elem_bytes=3)
        rec = {"level": lvl, "T": T, "R": R}

        def grid_full(pA, pB, c, s):
            cc = c + s * 1e-30
            outs = dg.dccl_packed_lookup_grid(pA, pB, mA, mB, cc, cc,
                                              gA, gB, scale)
            return outs[0].sum()

        rec["grid_full_ms"] = round(timed_scan(grid_full, pA, pB, cen), 3)

        # planes anchor: coords precomputed outside (timing excludes their
        # construction — random plausible in-range coords; gather timing is
        # index-value independent)
        kx = jax.random.uniform(jax.random.fold_in(rng, 10 + lvl),
                                (Q, LANES), jnp.float32) * Wl
        ky = jax.random.uniform(jax.random.fold_in(rng, 20 + lvl),
                                (Q, LANES), jnp.float32) * Hl

        def planes(pA, pB, c, s):
            cc = c + s * 1e-30
            outs = dg.dccl_packed_lookup_planes(pA, pB, mA, mB, cc, cc,
                                                kx, ky, kx, ky, scale)
            return outs[0].sum()

        rec["planes_ms"] = round(timed_scan(planes, pA, pB, cen), 3)

        for name, body, n_out in (
                ("own_only", _own_only_kernel, 2),
                ("gridwin_only", _gridwin_only_kernel, 4),
                ("cross_only", _cross_only_kernel, 2)):
            def run(pA, pB, c, s, body=body, n_out=n_out):
                cc = (c.reshape(Q, 2) + s * 1e-30)
                outs = _variant_call(body, n_out, pA, pB, cc, cc,
                                     gcatA, gcatB, T, R, Hl, Wl, Hg, Wg,
                                     scale)
                return outs[0].sum()

            rec[f"{name}_ms"] = round(timed_scan(run, pA, pB, cen), 3)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
