"""A/B variants of the DCCL kernel's grid-window stage on hardware.

tools/microbench_kernel_split.py measured the in-kernel grid-window
coordinate computation (_grid_window: one-hot strip matmul + 9-step
j-loop of lane gathers) at 0.60-0.90 ms per level call — with two calls
per level and four levels, roughly HALF the whole DCCL budget
(~28 ms/forward at 512x1024) — and its cost is level-size independent,
explaining the flat per-level kernel profile.

A whole-forward rewrite attempt (round 4) measured 108 -> 245 ms: Mosaic
op-level costs are not predictable from op counts, so every candidate is
benched here IN ISOLATION with the gridwin-only kernel harness before
any default changes. Variants must be bit-identical: each is asserted
against the shipped _grid_window on random centres first (interpret
mode), then timed compiled.

    python tools/microbench_gridwin.py
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
NTAP = 81


# --------------------------------------------------------------------------
# variants: same signature/semantics as dccl_gather._grid_window
# --------------------------------------------------------------------------

def _strip_and_corners(Gcat, cen, T, Hg, Wg, scale):
    """Shared prologue: one-hot strip matmul + tap corner/weight algebra."""
    cx = cen[:, 0:1] * scale
    cy = cen[:, 1:2] * scale
    y0 = jnp.floor(cy)
    fy = cy - y0
    tx = cx % Wg
    x0 = jnp.floor(tx)
    fx = tx - x0

    jrow = jax.lax.broadcasted_iota(jnp.int32, (1, 10, 1), 1
                                    ).astype(jnp.float32) - 4.0
    hcol = jax.lax.broadcasted_iota(jnp.int32, (T, 10, Hg), 2
                                    ).astype(jnp.float32)
    A = (hcol == (y0[:, :, None] + jrow)).astype(jnp.float32)
    S = jax.lax.dot_general(A.reshape(T * 10, Hg), Gcat,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32
                            ).reshape(T, 10, 2 * LANES)

    kk = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 1)
    ii = jnp.where(kk < NTAP, kk // 9, 0).astype(jnp.float32) - 4.0
    jj = jnp.where(kk < NTAP, kk % 9, 0)
    c0 = (x0 + ii) % Wg
    seam = (c0 != (Wg - 1)).astype(jnp.float32)
    c0i = c0.astype(jnp.int32)
    c1i = jnp.minimum(c0i + 1, Wg - 1)
    w0 = 1.0 - fx
    w1 = fx * seam
    return S, fy, jj, c0i, c1i, w0, w1


def gridwin_hoist_blend(Gcat, cen, T, Hg, Wg, scale):
    """v_c: y-blend the strip once per plane OUTSIDE the j-loop; the loop
    keeps the shipped small (T, 128) gathers."""
    S, fy, jj, c0i, c1i, w0, w1 = _strip_and_corners(Gcat, cen, T, Hg, Wg,
                                                     scale)
    outs = []
    for c in range(2):
        plane = S[:, :, c * LANES:(c + 1) * LANES]      # (T, 10, 128)
        rows = ((1.0 - fy)[:, :, None] * plane[:, :9, :]
                + fy[:, :, None] * plane[:, 1:, :])     # (T, 9, 128)
        acc = jnp.zeros((T, LANES), jnp.float32)
        for j in range(9):
            row = rows[:, j, :]
            v = w0 * jnp.take_along_axis(row, c0i, axis=1) \
                + w1 * jnp.take_along_axis(row, c1i, axis=1)
            acc = acc + jnp.where(jj == j, v, 0.0)
        outs.append(acc)
    return outs[0], outs[1]


def gridwin_mask_dot(Gcat, cen, T, Hg, Wg, scale):
    """v_d: keep per-j gathers but replace the 9x where+add chain with one
    masked multiply + sublane reduction."""
    S, fy, jj, c0i, c1i, w0, w1 = _strip_and_corners(Gcat, cen, T, Hg, Wg,
                                                     scale)
    jmask = (jax.lax.broadcasted_iota(jnp.int32, (1, 9, 1), 1)
             == jj[:, None, :]).astype(jnp.float32)     # (T, 9, 128)
    outs = []
    for c in range(2):
        plane = S[:, :, c * LANES:(c + 1) * LANES]
        rows = ((1.0 - fy)[:, :, None] * plane[:, :9, :]
                + fy[:, :, None] * plane[:, 1:, :])
        vs = []
        for j in range(9):
            row = rows[:, j, :]
            vs.append(w0 * jnp.take_along_axis(row, c0i, axis=1)
                      + w1 * jnp.take_along_axis(row, c1i, axis=1))
        v = jnp.stack(vs, axis=1)                        # (T, 9, 128)
        outs.append(jnp.sum(v * jmask, axis=1))
    return outs[0], outs[1]


def gridwin_select_first(Gcat, cen, T, Hg, Wg, scale):
    """v_e: select the tap's strip row BEFORE gathering: build the
    per-lane blended row row[t, k] = rows[t, j(k), :] via 9 static-mask
    selects of full rows, then do ONE gather per corner per plane."""
    S, fy, jj, c0i, c1i, w0, w1 = _strip_and_corners(Gcat, cen, T, Hg, Wg,
                                                     scale)
    outs = []
    for c in range(2):
        plane = S[:, :, c * LANES:(c + 1) * LANES]
        rows = ((1.0 - fy)[:, :, None] * plane[:, :9, :]
                + fy[:, :, None] * plane[:, 1:, :])      # (T, 9, 128)
        # sel[t, k] carries rows[t, j(k), k'] AT EVERY LANE k' — we need
        # the value at lane c0i[k], which is NOT k. So selection must act
        # on already-gathered rows; to keep one gather per corner, gather
        # each strip row at the full tap lane vector first (9 gathers of
        # (T,128)), then select. Net: same gather count as shipped but
        # gathers are independent (no accumulate chain between them).
        g0 = [jnp.take_along_axis(rows[:, j, :], c0i, axis=1)
              for j in range(9)]
        g1 = [jnp.take_along_axis(rows[:, j, :], c1i, axis=1)
              for j in range(9)]
        acc = jnp.zeros((T, LANES), jnp.float32)
        for j in range(9):
            acc = acc + jnp.where(jj == j, w0 * g0[j] + w1 * g1[j], 0.0)
        outs.append(acc)
    return outs[0], outs[1]


def gridwin_f32_words(Gcat, cen, T, Hg, Wg, scale):
    """v_f: gather x- and y-planes TOGETHER: interleave the two planes'
    strips into one (T, 9, 128) pair... not expressible without packing
    two f32 into one word — placeholder variant that simply reorders the
    plane loop inside the j-loop so both planes' gathers share each row
    index vector's liveness."""
    S, fy, jj, c0i, c1i, w0, w1 = _strip_and_corners(Gcat, cen, T, Hg, Wg,
                                                     scale)
    accx = jnp.zeros((T, LANES), jnp.float32)
    accy = jnp.zeros((T, LANES), jnp.float32)
    rowsx = ((1.0 - fy)[:, :, None] * S[:, :9, :LANES]
             + fy[:, :, None] * S[:, 1:, :LANES])
    rowsy = ((1.0 - fy)[:, :, None] * S[:, :9, LANES:]
             + fy[:, :, None] * S[:, 1:, LANES:])
    for j in range(9):
        m = jj == j
        vx = w0 * jnp.take_along_axis(rowsx[:, j, :], c0i, axis=1) \
            + w1 * jnp.take_along_axis(rowsx[:, j, :], c1i, axis=1)
        vy = w0 * jnp.take_along_axis(rowsy[:, j, :], c0i, axis=1) \
            + w1 * jnp.take_along_axis(rowsy[:, j, :], c1i, axis=1)
        accx = accx + jnp.where(m, vx, 0.0)
        accy = accy + jnp.where(m, vy, 0.0)
    return accx, accy


def gridwin_strip_only(Gcat, cen, T, Hg, Wg, scale):
    """diagnostic: prologue only (one-hot + MXU strip + corner algebra) —
    no j-loop. NOT semantics-preserving; excluded from the parity gate."""
    S, fy, jj, c0i, c1i, w0, w1 = _strip_and_corners(Gcat, cen, T, Hg, Wg,
                                                     scale)
    a = (jnp.sum(S[:, :, :LANES], axis=1) + fy * w0 + w1
         + (jj + c0i + c1i).astype(jnp.float32))
    return a, jnp.sum(S[:, :, LANES:], axis=1)


def gridwin_jloop_only(Gcat, cen, T, Hg, Wg, scale):
    """diagnostic: the j-loop on a FAKE strip (no one-hot/matmul) — NOT
    semantics-preserving; excluded from the parity gate."""
    cx = cen[:, 0:1] * scale
    tx = cx % Wg
    x0 = jnp.floor(tx)
    fx = tx - x0
    fy = cen[:, 1:2] * scale - jnp.floor(cen[:, 1:2] * scale)
    S = jnp.broadcast_to((cen[:, 0:1] * scale)[:, :, None],
                         (T, 10, 2 * LANES)) + 1.0

    kk = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 1)
    ii = jnp.where(kk < NTAP, kk // 9, 0).astype(jnp.float32) - 4.0
    jj = jnp.where(kk < NTAP, kk % 9, 0)
    c0 = (x0 + ii) % Wg
    seam = (c0 != (Wg - 1)).astype(jnp.float32)
    c0i = c0.astype(jnp.int32)
    c1i = jnp.minimum(c0i + 1, Wg - 1)
    w0 = 1.0 - fx
    w1 = fx * seam
    outs = []
    for c in range(2):
        plane = S[:, :, c * LANES:(c + 1) * LANES]
        acc = jnp.zeros((T, LANES), jnp.float32)
        for j in range(9):
            row = (1.0 - fy) * plane[:, j, :] + fy * plane[:, j + 1, :]
            v = w0 * jnp.take_along_axis(row, c0i, axis=1) \
                + w1 * jnp.take_along_axis(row, c1i, axis=1)
            acc = acc + jnp.where(jj == j, v, 0.0)
        outs.append(acc)
    return outs[0], outs[1]


def gridwin_preblend(Gcat, cen, T, Hg, Wg, scale):
    """v_preblend: fold the x-bilinear into GRID space. All 81 taps share
    one (fx, fy) pair per query, so the x-blend weight of every tap is the
    query-scalar fx: pre-blend each y-blended strip row with its
    lane-rolled neighbour once — rowb[x] = (1-fx)*row[x]
    + fx*row[x+1]*(x != Wg-1) — and each tap needs ONE gather at c0
    instead of two at (c0, c1). BIT-EXACT vs shipped: the seam/wrap masks
    are exact {0,1} multiplies and the final sum has the same two addends
    in the same order; the per-tap c0 already encodes the (x0+ii) % Wg
    wrap, and for c0 < Wg-1 the +1 neighbour never crosses the pad region.
    Dynamic lane gathers are the stage's dominant op; a static roll-by-1
    plus two multiplies is far cheaper than a second gather."""
    cx = cen[:, 0:1] * scale
    cy = cen[:, 1:2] * scale
    y0 = jnp.floor(cy)
    fy = cy - y0
    tx = cx % Wg
    x0 = jnp.floor(tx)
    fx = tx - x0

    jrow = jax.lax.broadcasted_iota(jnp.int32, (1, 10, 1), 1
                                    ).astype(jnp.float32) - 4.0
    hcol = jax.lax.broadcasted_iota(jnp.int32, (T, 10, Hg), 2
                                    ).astype(jnp.float32)
    A = (hcol == (y0[:, :, None] + jrow)).astype(jnp.float32)
    S = jax.lax.dot_general(A.reshape(T * 10, Hg), Gcat,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32
                            ).reshape(T, 10, 2 * LANES)

    kk = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 1)
    ii = jnp.where(kk < NTAP, kk // 9, 0).astype(jnp.float32) - 4.0
    jj = jnp.where(kk < NTAP, kk % 9, 0)
    c0i = ((x0 + ii) % Wg).astype(jnp.int32)
    # static last-valid-column mask: the x+1 contribution is ZERO at
    # column Wg-1 (the reference sampler's seam rule)
    notseam = (jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
               != (Wg - 1)).astype(jnp.float32)

    outs = []
    for c in range(2):
        plane = S[:, :, c * LANES:(c + 1) * LANES]
        acc = jnp.zeros((T, LANES), jnp.float32)
        for j in range(9):
            row = (1.0 - fy) * plane[:, j, :] + fy * plane[:, j + 1, :]
            # roll by LANES-1 == roll by -1: nxt[x] = row[x+1]
            nxt = pltpu.roll(row, LANES - 1, 1) * notseam
            rowb = (1.0 - fx) * row + fx * nxt
            acc = acc + jnp.where(jj == j,
                                  jnp.take_along_axis(rowb, c0i, axis=1),
                                  0.0)
        outs.append(acc)
    return outs[0], outs[1]


VARIANTS = {
    "hoist_blend": gridwin_hoist_blend,
    "mask_dot": gridwin_mask_dot,
    "select_first": gridwin_select_first,
    "both_planes": gridwin_f32_words,
    "preblend": gridwin_preblend,
}
DIAG_VARIANTS = {
    "strip_only": gridwin_strip_only,
    "jloop_only": gridwin_jloop_only,
}


def gridwin_pair_stacked(gcatA, gcatB, cenA, cenB, T, Hg, Wg, scale):
    """v_stacked: BOTH branches' windows in one pass — the four strip
    planes [Ax, Ay, Bx, By] are stacked along the sublane axis so the
    9-step j-loop issues 4x-taller vector ops: the stage is op-issue
    bound ((T,128) = 4 vregs per op), so quartering the issue count at
    equal vreg-work should approach a 3-4x win. One concat copy builds
    the stacked layout (~590 KB/step — VMEM-bandwidth noise)."""
    def prep(cen):
        cx = cen[:, 0:1] * scale
        cy = cen[:, 1:2] * scale
        y0 = jnp.floor(cy)
        fy = cy - y0
        tx = cx % Wg
        x0 = jnp.floor(tx)
        fx = tx - x0
        return y0, fy, x0, fx

    def onehot(y0):
        jrow = jax.lax.broadcasted_iota(jnp.int32, (1, 10, 1), 1
                                        ).astype(jnp.float32) - 4.0
        hcol = jax.lax.broadcasted_iota(jnp.int32, (T, 10, Hg), 2
                                        ).astype(jnp.float32)
        return (hcol == (y0[:, :, None] + jrow)).astype(jnp.float32
                                                        ).reshape(T * 10, Hg)

    y0A, fyA, x0A, fxA = prep(cenA)
    y0B, fyB, x0B, fxB = prep(cenB)
    SA = jax.lax.dot_general(onehot(y0A), gcatA, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).reshape(T, 10, 2 * LANES)
    SB = jax.lax.dot_general(onehot(y0B), gcatB, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).reshape(T, 10, 2 * LANES)
    rowsA = ((1.0 - fyA)[:, :, None] * SA[:, :9, :]
             + fyA[:, :, None] * SA[:, 1:, :])       # (T, 9, 256)
    rowsB = ((1.0 - fyB)[:, :, None] * SB[:, :9, :]
             + fyB[:, :, None] * SB[:, 1:, :])
    rows4 = jnp.concatenate(
        [rowsA[:, :, :LANES], rowsA[:, :, LANES:],
         rowsB[:, :, :LANES], rowsB[:, :, LANES:]], axis=0)  # (4T, 9, 128)

    kk = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 1)
    ii = jnp.where(kk < NTAP, kk // 9, 0).astype(jnp.float32) - 4.0

    def corners(x0, fx):
        c0 = (x0 + ii) % Wg
        seam = (c0 != (Wg - 1)).astype(jnp.float32)
        c0i = c0.astype(jnp.int32)
        c1i = jnp.minimum(c0i + 1, Wg - 1)
        return c0i, c1i, 1.0 - fx, fx * seam

    c0A, c1A, w0A, w1A = corners(x0A, fxA)
    c0B, c1B, w0B, w1B = corners(x0B, fxB)
    c0i4 = jnp.concatenate([c0A, c0A, c0B, c0B], axis=0)
    c1i4 = jnp.concatenate([c1A, c1A, c1B, c1B], axis=0)
    w04 = jnp.concatenate([w0A, w0A, w0B, w0B], axis=0)
    w14 = jnp.concatenate([w1A, w1A, w1B, w1B], axis=0)
    jj4 = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (4 * T, LANES), 1) < NTAP,
        jax.lax.broadcasted_iota(jnp.int32, (4 * T, LANES), 1) % 9, 0)

    acc = jnp.zeros((4 * T, LANES), jnp.float32)
    for j in range(9):
        row = rows4[:, j, :]
        v = w04 * jnp.take_along_axis(row, c0i4, axis=1) \
            + w14 * jnp.take_along_axis(row, c1i4, axis=1)
        acc = acc + jnp.where(jj4 == j, v, 0.0)
    return acc[:T], acc[T:2 * T], acc[2 * T:3 * T], acc[3 * T:]


PAIR_VARIANTS = {
    "pair_stacked": gridwin_pair_stacked,
}


def _pair_kernel(fn, cenA_ref, cenB_ref, gA_ref, gB_ref, cAx_ref, cAy_ref,
                 cBx_ref, cBy_ref, *, T, Hg, Wg, scale):
    cAx, cAy, cBx, cBy = fn(gA_ref[:], gB_ref[:], cenA_ref[:], cenB_ref[:],
                            T, Hg, Wg, scale)
    cAx_ref[:] = cAx
    cAy_ref[:] = cAy
    cBx_ref[:] = cBx
    cBy_ref[:] = cBy


def pair_call(fn, cenA, cenB, gcatA, gcatB, T, Hg, Wg, scale,
              interpret=False):
    BQ = cenA.shape[0]
    kern = functools.partial(_pair_kernel, fn, T=T, Hg=Hg, Wg=Wg,
                             scale=scale)
    row = lambda q: (q, 0)
    const2 = lambda q: (0, 0)
    return pl.pallas_call(
        kern,
        grid=(BQ // T,),
        in_specs=[
            pl.BlockSpec((T, 2), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 2), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hg, 2 * LANES), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hg, 2 * LANES), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((T, LANES), row, memory_space=pltpu.VMEM)
            for _ in range(4)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((BQ, LANES), jnp.float32)
            for _ in range(4)),
        interpret=interpret,
    )(cenA, cenB, gcatA, gcatB)


def _variant_kernel(fn, cen_ref, gA_ref, gB_ref, cAx_ref, cAy_ref,
                    cBx_ref, cBy_ref, *, T, Hg, Wg, scale):
    cAx, cAy = fn(gA_ref[:], cen_ref[:], T, Hg, Wg, scale)
    cBx, cBy = fn(gB_ref[:], cen_ref[:], T, Hg, Wg, scale)
    cAx_ref[:] = cAx
    cAy_ref[:] = cAy
    cBx_ref[:] = cBx
    cBy_ref[:] = cBy


def variant_call(fn, cen, gcatA, gcatB, T, Hg, Wg, scale, interpret=False):
    BQ = cen.shape[0]
    kern = functools.partial(_variant_kernel, fn, T=T, Hg=Hg, Wg=Wg,
                             scale=scale)
    row = lambda q: (q, 0)
    const2 = lambda q: (0, 0)
    return pl.pallas_call(
        kern,
        grid=(BQ // T,),
        in_specs=[
            pl.BlockSpec((T, 2), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hg, 2 * LANES), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hg, 2 * LANES), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((T, LANES), row, memory_space=pltpu.VMEM)
            for _ in range(4)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((BQ, LANES), jnp.float32)
            for _ in range(4)),
        interpret=interpret,
    )(cen, gcatA, gcatB)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    import numpy as np

    from prior_flow_tpu.geometry.grids import rotation_grids, identity_grid
    from prior_flow_tpu.ops.pallas import dccl_gather as dg

    h8, w8 = H // 8, W // 8
    Q = h8 * w8
    T = 32
    rg = rotation_grids(H, W)
    gA = jnp.asarray(rg.a2b_w2c_8, jnp.float32)
    gB = jnp.asarray(rg.b2a_w2c_8, jnp.float32)
    gcatA = dg.pack_grid_planes(gA)
    gcatB = dg.pack_grid_planes(gB)
    Hg, Wg = gA.shape[:2]

    rng = np.random.default_rng(0)
    cen = (np.asarray(identity_grid(h8, w8)).reshape(Q, 2)
           + rng.normal(size=(Q, 2)) * 5).astype(np.float32)
    cen = jnp.asarray(cen)

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of variant names to run")
    args = ap.parse_args()
    if args.only is not None:
        for d in (VARIANTS, DIAG_VARIANTS, PAIR_VARIANTS):
            for k in list(d):
                if k not in args.only:
                    del d[k]

    # correctness gate vs the shipped implementation (interpret mode)
    ref = variant_call(
        lambda G, c, T, Hg, Wg, s: dg._grid_window(G, c, T, Hg, Wg, s),
        cen[:256], gcatA, gcatB, T, Hg, Wg, 1.0, interpret=True)
    for name, fn in VARIANTS.items():
        out = variant_call(fn, cen[:256], gcatA, gcatB, T, Hg, Wg, 1.0,
                           interpret=True)
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, err_msg=name)
        print(f"parity ok: {name}", flush=True)

    # timing (compiled, scale=1.0 — cost is scale-independent)
    def shipped(c, s):
        cc = c + s * 1e-30
        outs = variant_call(
            lambda G, cn, T, Hg, Wg, sc: dg._grid_window(G, cn, T, Hg, Wg,
                                                         sc),
            cc, gcatA, gcatB, T, Hg, Wg, 1.0)
        return outs[0].sum()

    rec = {"shipped_ms": round(timed_scan(shipped, cen), 3)}
    for name, fn in VARIANTS.items():
        def run(c, s, fn=fn):
            cc = c + s * 1e-30
            outs = variant_call(fn, cc, gcatA, gcatB, T, Hg, Wg, 1.0)
            return outs[0].sum()

        rec[f"{name}_ms"] = round(timed_scan(run, cen), 3)

    # diagnostic stage splits (no parity gate: not semantics-preserving)
    for name, fn in DIAG_VARIANTS.items():
        def rund(c, s, fn=fn):
            cc = c + s * 1e-30
            outs = variant_call(fn, cc, gcatA, gcatB, T, Hg, Wg, 1.0)
            return outs[0].sum()

        rec[f"{name}_ms"] = round(timed_scan(rund, cen), 3)

    # pair variants: parity vs two shipped windows, then timing
    cenB = cen[::-1]
    for name, fn in PAIR_VARIANTS.items():
        refA = variant_call(
            lambda G, c, T, Hg, Wg, s: dg._grid_window(G, c, T, Hg, Wg, s),
            cen[:256], gcatA, gcatB, T, Hg, Wg, 1.0, interpret=True)
        refB = variant_call(
            lambda G, c, T, Hg, Wg, s: dg._grid_window(G, c, T, Hg, Wg, s),
            cenB[:256], gcatB, gcatA, T, Hg, Wg, 1.0, interpret=True)
        out = pair_call(fn, cen[:256], cenB[:256], gcatA, gcatB, T, Hg, Wg,
                        1.0, interpret=True)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(refA[0]),
                                   atol=1e-6, err_msg=name)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(refA[1]),
                                   atol=1e-6, err_msg=name)
        np.testing.assert_allclose(np.asarray(out[2]), np.asarray(refB[0]),
                                   atol=1e-6, err_msg=name)
        np.testing.assert_allclose(np.asarray(out[3]), np.asarray(refB[1]),
                                   atol=1e-6, err_msg=name)
        print(f"parity ok: {name}", flush=True)

        def runp(cA, cB, s, fn=fn):
            outs = pair_call(fn, cA + s * 1e-30, cB, gcatA, gcatB, T, Hg,
                             Wg, 1.0)
            return outs[0].sum()

        rec[f"{name}_ms"] = round(timed_scan(runp, cen, cenB), 3)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
