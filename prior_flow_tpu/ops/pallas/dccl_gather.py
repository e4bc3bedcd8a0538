"""Gather-based fused Pallas TPU kernel for the DCCL correlation lookup.

Replaces the one-hot-matmul formulation (ops.corr lookup_window_mxu /
sample_volume_level_mxu — reference semantics core/corr.py:113-144) with the
TPU primitive that actually fits the problem: ``tpu.dynamic_gather`` along
the lane axis (exposed as equal-shape 2D ``jnp.take_along_axis`` inside
Pallas). Design, per pyramid level and per tile of query pixels:

- the level volume is viewed as ``(BQ, R, 128)`` lane-packed rows — a FREE
  row-major reshape of ``(BQ, Hl, Wl)`` with ``R = Hl*Wl/128`` — so every
  bilinear corner is one lane index ``(y % P)*Wl + x`` in packed row
  ``y // P`` (``P = 128/Wl``);
- each of the 4 bilinear corners of all 81 window taps is fetched with ONE
  equal-shape lane gather over the tile (the x/corner select), followed by a
  binary row-select network + 8-row one-hot reduce (the y select) — no
  matmuls, no HBM intermediates, each volume element read exactly once;
- one kernel instance serves BOTH branches: volume A answers branch A's own
  window AND branch B's cross-view taps (core/corr.py:132-136), volume B
  vice versa, halving volume traffic relative to two separate calls.

Boundary semantics are exactly the reference sampler's
(``cycle_bilinear_sampler``, core/utils/utils.py:78-95): x wraps mod Wl but
the x+1 corner at column Wl contributes ZERO (the seam quirk), y corners
outside [0, Hl-1] contribute zero. Verified against a direct numpy oracle
and against ops.corr's einsum path at matmul precision 'highest'.

Measured on one v5e (512x1024, level 0, own+cross for one volume):
0.71 ms vs 1.86 ms for the einsum path — and the kernel result is MORE
precise (the einsum path rounds operands to bf16 at default precision).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
NTAP = 81  # (2*radius+1)**2 with radius 4

# Tile-size tuning knobs (read at trace time; tools/tune_dccl_tile.py sweeps
# them on hardware). The kernel grid runs BQ/T steps — a larger query tile T
# amortises the per-step fixed cost (DMA issue, loop/semaphore overhead,
# MXU setup for the grid matmul) over more queries at the price of VMEM.
# The profiled per-level costs are nearly FLAT across pyramid levels despite
# 4x-shrinking volumes (19.4/15.2/13.1/8.3 ms per forward at 512x1024),
# which points at per-step overhead, not gather work, as the binding cost.
TILE_CAP = int(os.environ.get("PRIORFLOW_DCCL_TILE_CAP", "32"))
GRID_VMEM_BUDGET = int(os.environ.get("PRIORFLOW_DCCL_GRID_BUDGET",
                                      str(2 * 1024 * 1024)))
PLAIN_VMEM_BUDGET = int(os.environ.get("PRIORFLOW_DCCL_PLAIN_BUDGET",
                                       str(8 * 1024 * 1024)))
_TILE_SIZES = (512, 256, 128, 64, 32, 16, 8, 4, 2, 1)


def _row_select(g, rsel, R):
    """Per-(tile,lane) row selection from ``g`` (T, R, S), any dtype.

    rsel: (T, S) int32 in [0, R). Binary halving network down to 8 rows
    (sublane-aligned static slices), then a one-hot reduce. R must be a
    power of two (volume extents are). Runs in the VOLUME dtype (bf16 on
    the fast path — selection preserves values exactly and halves the VPU
    traffic of the halving network); callers upcast the selected corners.
    """
    cur = g
    m = R
    while m > 8:
        m //= 2
        bit = (rsel & m) != 0
        cur = jnp.where(bit[:, None, :], cur[:, m:2 * m, :], cur[:, :m, :])
    if m > 1:
        oh = (jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)
              == (rsel & (m - 1))[:, None, :])
        return jnp.sum(jnp.where(oh, cur, jnp.zeros((), cur.dtype)), axis=1)
    return cur[:, 0, :]


def _sample_taps(Vflat, T, R, Hl, Wl, tapx, tapy):
    """Bilinear sample of per-query packed volume rows at per-tap coords.

    Vflat: (T*R, 128) in the volume's storage dtype; tapx/tapy: (T, 128)
    f32 (extra slots ignored). Semantics == cycle_bilinear_sampler: x
    wrapped mod Wl with the zero blend at the (Wl-1, Wl) seam; y
    zero-padded outside [0, Hl-1]. Returns (T, 128) f32.

    bf16 fast path: Mosaic's lane gather is 32-bit only, so consecutive
    bf16 rows are BITCAST into i32 row-pair words (row 2p in the low half,
    2p+1 in the high half — v5e sublane packing). One i32 gather then
    fetches two volume rows at once, the row-select network runs over R/2
    word rows, and the wanted half is extracted by shifting into f32 bit
    position — halving both gather traffic and select work vs f32, with
    EXACT results (bit extraction, no rounding).
    """
    tx = tapx % Wl
    x0 = jnp.floor(tx)
    fx = tx - x0
    y0 = jnp.floor(tapy)
    fy = tapy - y0

    my0 = ((y0 >= 0) & (y0 <= Hl - 1)).astype(jnp.float32)
    my1 = ((y0 + 1 >= 0) & (y0 + 1 <= Hl - 1)).astype(jnp.float32)
    mx1 = (x0 != (Wl - 1)).astype(jnp.float32)

    y0c = jnp.clip(y0, 0, Hl - 1).astype(jnp.int32)
    y1c = jnp.clip(y0 + 1, 0, Hl - 1).astype(jnp.int32)
    x0i = jnp.clip(x0, 0, Wl - 1).astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, Wl - 1)

    paired = Vflat.dtype == jnp.bfloat16 and R % 2 == 0
    if paired:
        W32 = pltpu.bitcast(Vflat, jnp.int32)  # (T*R//2, 128) row pairs
        Rw = R // 2

        def gather(lane):
            idx = jnp.broadcast_to(lane[:, None, :], (T, Rw, LANES)
                                   ).reshape(T * Rw, LANES)
            return jnp.take_along_axis(W32, idx, axis=1
                                       ).reshape(T, Rw, LANES)

        def pick(g, rsel):
            word = _row_select(g, rsel >> 1, Rw)
            hi = (rsel & 1) == 1
            bits = jnp.where(hi, word & jnp.int32(-65536), word << 16)
            return pltpu.bitcast(bits, jnp.float32)
    else:
        Vf = Vflat.astype(jnp.float32)

        def gather(lane):
            idx = jnp.broadcast_to(lane[:, None, :], (T, R, LANES)
                                   ).reshape(T * R, LANES)
            return jnp.take_along_axis(Vf, idx, axis=1).reshape(T, R, LANES)

        def pick(g, rsel):
            return _row_select(g, rsel, R)

    # packed layout: flat = y*Wl + x -> row = flat // 128, lane = flat % 128
    if Wl >= LANES and Wl % LANES == 0:
        # lane index is independent of y: the two y-corners share a gather
        nb = Wl // LANES
        g0 = gather(x0i % LANES)
        g1 = gather(x1i % LANES)
        v00 = pick(g0, y0c * nb + x0i // LANES)
        v10 = pick(g0, y1c * nb + x0i // LANES)
        v01 = pick(g1, y0c * nb + x1i // LANES)
        v11 = pick(g1, y1c * nb + x1i // LANES)
    else:
        def corner(yc, xc):
            flat = yc * Wl + xc
            return pick(gather(flat % LANES), flat // LANES)

        v00 = corner(y0c, x0i)
        v01 = corner(y0c, x1i)
        v10 = corner(y1c, x0i)
        v11 = corner(y1c, x1i)

    return ((1 - fy) * (1 - fx) * v00 * my0
            + (1 - fy) * fx * v01 * my0 * mx1
            + fy * (1 - fx) * v10 * my1
            + fy * fx * v11 * my1 * mx1)


def _own_taps(cen, scale):
    """Window tap coords around level-scaled centres, lane k = i*9 + j with
    x-offset i-4 / y-offset j-4 (reference tap order, core/corr.py:120-126)."""
    kk = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    ii = jnp.where(kk < NTAP, kk // 9, 0).astype(jnp.float32) - 4.0
    jj = jnp.where(kk < NTAP, kk % 9, 0).astype(jnp.float32) - 4.0
    ownx = cen[:, 0:1] * scale + ii
    owny = cen[:, 1:2] * scale + jj
    return ownx, owny


def _grid_window(Gcat, cen, T, Hg, Wg, scale):
    """In-kernel equivalent of ops.corr.sample_image_window_mxu: sample the
    (1/8-res) rotation grid at the 81 window coords around the level-scaled
    centres (reference core/corr.py:132-133 semantics).

    Gcat: (Hg, 256) f32 — x-plane in lanes [0, 128), y-plane in [128, 256)
    (each zero-padded to 128 lanes, valid width Wg <= 128);
    cen: (T, 2) f32 unscaled centres.
    Returns (tapx, tapy): (T, 128) f32 planes, slots k = i*9 + j.

    Because the window offsets are integers, all 81 taps share one
    (fx, fy) fractional pair per query: the ten needed grid rows are
    fetched with a single one-hot MXU matmul (f32 — EXACT, unlike the XLA
    einsum path which rounds the grid to bf16 at default precision), the
    y-bilinear is a 2-row blend of statically-sliced strips, and the
    x-bilinear is one lane gather per corner per strip row.
    """
    cx = cen[:, 0:1] * scale
    cy = cen[:, 1:2] * scale
    y0 = jnp.floor(cy)          # (T, 1)
    fy = cy - y0
    tx = cx % Wg
    x0 = jnp.floor(tx)
    fx = tx - x0

    # grid rows y0 - 4 + j for j in 0..9; out-of-range rows one-hot to
    # zero (the reference sampler's y zero-padding)
    jrow = jax.lax.broadcasted_iota(jnp.int32, (1, 10, 1), 1
                                    ).astype(jnp.float32) - 4.0
    hcol = jax.lax.broadcasted_iota(jnp.int32, (T, 10, Hg), 2
                                    ).astype(jnp.float32)
    A = (hcol == (y0[:, :, None] + jrow)).astype(jnp.float32)
    S = jax.lax.dot_general(A.reshape(T * 10, Hg), Gcat,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32
                            ).reshape(T, 10, 2 * LANES)

    # per-tap x corners: c_{i(k)} and c_{i(k)+1} with wrap + seam quirk
    kk = jax.lax.broadcasted_iota(jnp.int32, (T, LANES), 1)
    ii = jnp.where(kk < NTAP, kk // 9, 0).astype(jnp.float32) - 4.0
    jj = jnp.where(kk < NTAP, kk % 9, 0)
    c0 = (x0 + ii) % Wg                             # (T, 128)
    seam = (c0 != (Wg - 1)).astype(jnp.float32)
    c0i = c0.astype(jnp.int32)
    c1i = jnp.minimum(c0i + 1, Wg - 1)
    w0 = 1.0 - fx
    w1 = fx * seam

    outs = []
    for c in range(2):
        plane = S[:, :, c * LANES:(c + 1) * LANES]  # (T, 10, 128)
        acc = jnp.zeros((T, LANES), jnp.float32)
        for j in range(9):
            row = (1.0 - fy) * plane[:, j, :] + fy * plane[:, j + 1, :]
            v = w0 * jnp.take_along_axis(row, c0i, axis=1) \
                + w1 * jnp.take_along_axis(row, c1i, axis=1)
            acc = acc + jnp.where(jj == j, v, 0.0)
        outs.append(acc)
    return outs[0], outs[1]


def _dccl_grid_kernel(cenA_ref, cenB_ref, gA_ref, gB_ref, volA_ref, volB_ref,
                      ownA_ref, crossA_ref, ownB_ref, crossB_ref,
                      *coord_refs, T, R, Hl, Wl, Hg, Wg, scale):
    """Fully fused level kernel: grid-window coords computed in-kernel.

    With ``coord_refs`` (cAx, cAy, cBx, cBy) present, the extracted
    cross-view tap coords are also written out — they are the VJP's scatter
    targets (saving them beats recomputing: the in-kernel f32 strips are
    exact while the XLA einsum recompute rounds to bf16). The no-grad
    primal omits them: XLA cannot DCE individual outputs of a custom call,
    so the 4 dead planes would cost ~0.8 GB of HBM writes per 512x1024
    inference forward."""
    VA = volA_ref[:].reshape(T * R, LANES)
    VB = volB_ref[:].reshape(T * R, LANES)

    ax, ay = _own_taps(cenA_ref[:], scale)
    ownA_ref[:] = _sample_taps(VA, T, R, Hl, Wl, ax, ay)
    bx, by = _own_taps(cenB_ref[:], scale)
    ownB_ref[:] = _sample_taps(VB, T, R, Hl, Wl, bx, by)

    cAx, cAy = _grid_window(gA_ref[:], cenA_ref[:], T, Hg, Wg, scale)
    crossA_ref[:] = _sample_taps(VB, T, R, Hl, Wl, cAx, cAy)
    cBx, cBy = _grid_window(gB_ref[:], cenB_ref[:], T, Hg, Wg, scale)
    crossB_ref[:] = _sample_taps(VA, T, R, Hl, Wl, cBx, cBy)
    if coord_refs:
        cAx_ref, cAy_ref, cBx_ref, cBy_ref = coord_refs
        cAx_ref[:] = cAx
        cAy_ref[:] = cAy
        cBx_ref[:] = cBx
        cBy_ref[:] = cBy


def _dccl_grid_kernel_all(cenA_ref, cenB_ref, gA_ref, gB_ref, *refs,
                          T, Rs, Hls, Wls, Hg, Wg, scales, emit_coords):
    """All-levels fused variant of ``_dccl_grid_kernel``: one kernel launch
    (and one BQ/T grid sweep) serves every pyramid level, paying the
    per-grid-step fixed cost once instead of once per level. Profile
    motivation: per-level kernel cost at 512x1024 is nearly flat
    (19.4/15.2/13.1/8.3 ms/forward) while volumes shrink 4x per level —
    level 3's cost is almost pure per-step overhead.

    refs layout: [pA_0, pB_0, ..., pA_{L-1}, pB_{L-1}] volume inputs, then
    4L outputs [ownA_l, crossA_l, ownB_l, crossB_l]*L, then (if
    emit_coords) 4L coord outputs [cAx_l, cAy_l, cBx_l, cBy_l]*L.
    """
    L = len(Rs)
    vol_refs = refs[:2 * L]
    out_refs = refs[2 * L:2 * L + 4 * L]
    coord_refs = refs[2 * L + 4 * L:]
    cenA = cenA_ref[:]
    cenB = cenB_ref[:]
    gA = gA_ref[:]
    gB = gB_ref[:]
    for l in range(L):
        R, Hl, Wl, scale = Rs[l], Hls[l], Wls[l], scales[l]
        VA = vol_refs[2 * l][:].reshape(T * R, LANES)
        VB = vol_refs[2 * l + 1][:].reshape(T * R, LANES)
        ownA_ref, crossA_ref, ownB_ref, crossB_ref = out_refs[4 * l:4 * l + 4]

        ax, ay = _own_taps(cenA, scale)
        ownA_ref[:] = _sample_taps(VA, T, R, Hl, Wl, ax, ay)
        bx, by = _own_taps(cenB, scale)
        ownB_ref[:] = _sample_taps(VB, T, R, Hl, Wl, bx, by)

        cAx, cAy = _grid_window(gA, cenA, T, Hg, Wg, scale)
        crossA_ref[:] = _sample_taps(VB, T, R, Hl, Wl, cAx, cAy)
        cBx, cBy = _grid_window(gB, cenB, T, Hg, Wg, scale)
        crossB_ref[:] = _sample_taps(VA, T, R, Hl, Wl, cBx, cBy)
        if emit_coords:
            coord_refs[4 * l + 0][:] = cAx
            coord_refs[4 * l + 1][:] = cAy
            coord_refs[4 * l + 2][:] = cBx
            coord_refs[4 * l + 3][:] = cBy


def _dccl_kernel(cenA_ref, cenB_ref, cAx_ref, cAy_ref, cBx_ref, cBy_ref,
                 volA_ref, volB_ref,
                 ownA_ref, crossA_ref, ownB_ref, crossB_ref,
                 *, T, R, Hl, Wl, scale):
    # volumes stay in their storage dtype through gather + row-select
    # (exact); _sample_taps upcasts only the selected corners
    VA = volA_ref[:].reshape(T * R, LANES)
    VB = volB_ref[:].reshape(T * R, LANES)

    ax, ay = _own_taps(cenA_ref[:], scale)
    ownA_ref[:] = _sample_taps(VA, T, R, Hl, Wl, ax, ay)
    # branch B's cross-view taps land in volume A (core/corr.py:132-136)
    crossB_ref[:] = _sample_taps(VA, T, R, Hl, Wl, cBx_ref[:], cBy_ref[:])

    bx, by = _own_taps(cenB_ref[:], scale)
    ownB_ref[:] = _sample_taps(VB, T, R, Hl, Wl, bx, by)
    crossA_ref[:] = _sample_taps(VB, T, R, Hl, Wl, cAx_ref[:], cAy_ref[:])


def _pick_tile(BQ: int, R: int, budget: int = None,
               elem_bytes: int = 6) -> int:
    """Largest dividing tile (<= TILE_CAP) whose two volume tiles (input +
    gather working set) stay within the VMEM budget per grid step.

    ``elem_bytes``: VMEM bytes per volume element — 3 for bf16 volumes
    (2 in + ~1 amortised gather temporaries; no f32 copy is made since the
    row-select network runs in the storage dtype), 6 for f32.
    """
    if budget is None:
        budget = PLAIN_VMEM_BUDGET
    for t in _TILE_SIZES:
        if t > TILE_CAP:
            continue
        if BQ % t == 0 and 2 * t * R * LANES * elem_bytes <= budget:
            return t
    return 1


def _pad_taps(c):
    """(BQ, NTAP) -> (BQ, LANES) f32 with zero padding."""
    return jnp.pad(c.astype(jnp.float32), ((0, 0), (0, LANES - NTAP)))


def pack_volume(vol):
    """(B, Q, Hl, Wl) volume level -> (packed, meta).

    packed: (B*Q, R, 128) lane rows (a FREE reshape for pow2 ERP extents, a
    zero-padded copy otherwise); meta: a zero-size (0, Hl, Wl) array of the
    volume dtype carrying the static extents. Pack ONCE per forward, outside
    the GRU scan — repacking per iteration costs a real HBM copy for every
    level whose minor dims are tile-padded.
    """
    B, Q, Hl, Wl = vol.shape
    BQ = B * Q
    R = max(1, -(-(Hl * Wl) // LANES))
    R2 = 1
    while R2 < R:
        R2 *= 2
    if Hl * Wl == R2 * LANES:
        packed = vol.reshape(BQ, R2, LANES)
    else:
        pad = ((0, 0), (0, R2 * LANES - Hl * Wl))
        packed = jnp.pad(vol.reshape(BQ, Hl * Wl), pad).reshape(BQ, R2, LANES)
    meta = jnp.zeros((0, Hl, Wl), vol.dtype)
    return packed, meta


def _packed_call_coords(pA, pB, Hl, Wl, cen_A, cen_B, cross_A, cross_B,
                        level_scale, interpret):
    BQ = pA.shape[0]
    cAx = _pad_taps(cross_A[..., 0].reshape(BQ, NTAP))
    cAy = _pad_taps(cross_A[..., 1].reshape(BQ, NTAP))
    cBx = _pad_taps(cross_B[..., 0].reshape(BQ, NTAP))
    cBy = _pad_taps(cross_B[..., 1].reshape(BQ, NTAP))
    return _packed_call_planes(pA, pB, Hl, Wl, cen_A, cen_B,
                               cAx, cAy, cBx, cBy, level_scale, interpret)


def _packed_call_planes(pA, pB, Hl, Wl, cen_A, cen_B, cAx, cAy, cBx, cBy,
                        level_scale, interpret):
    """cAx..cBy: (B*Q, LANES) f32 tap-coordinate planes (pre-padded)."""
    BQ, R, _ = pA.shape
    B, Q = cen_A.shape[:2]
    T = _pick_tile(BQ, R, elem_bytes=3 if pA.dtype == jnp.bfloat16 else 6)
    cenA = cen_A.reshape(BQ, 2).astype(jnp.float32)
    cenB = cen_B.reshape(BQ, 2).astype(jnp.float32)

    kern = functools.partial(_dccl_kernel, T=T, R=R, Hl=Hl, Wl=Wl,
                             scale=float(level_scale))
    row = lambda q: (q, 0)
    vol3 = lambda q: (q, 0, 0)
    outs = pl.pallas_call(
        kern,
        grid=(BQ // T,),
        in_specs=[
            pl.BlockSpec((T, 2), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 2), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, LANES), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, LANES), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, LANES), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, LANES), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, R, LANES), vol3, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, R, LANES), vol3, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((T, LANES), row, memory_space=pltpu.VMEM)
            for _ in range(4)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((BQ, LANES), jnp.float32) for _ in range(4)),
        interpret=interpret,
    )(cenA, cenB, cAx, cAy, cBx, cBy, pA, pB)

    return tuple(o[:, :NTAP].reshape(B, Q, NTAP) for o in outs)


def dccl_level_lookup_fused(vol_A, vol_B, cen_A, cen_B, cross_A, cross_B,
                            level_scale: float = 1.0,
                            interpret: bool = False):
    """Fused own+cross DCCL lookup for one pyramid level, both branches.

    vol_A, vol_B: (B, Q, Hl, Wl) volume level (any float dtype);
    cen_A, cen_B: (B, Q, 2) UNSCALED 1/8-res window centres (scaled by
    ``level_scale`` in-kernel, core/corr.py:123);
    cross_A, cross_B: (B, Q, 81, 2) cross-view tap coords — branch A's taps
    index volume B and vice versa (core/corr.py:132-136).
    Returns (own_A, cross_A, own_B, cross_B): each (B, Q, 81) float32 with
    tap order k = i*9 + j.
    """
    Hl, Wl = vol_A.shape[2:]
    pA, _ = pack_volume(vol_A)
    pB, _ = pack_volume(vol_B)
    return _packed_call_coords(pA, pB, Hl, Wl, cen_A, cen_B,
                               cross_A, cross_B, level_scale, interpret)


def _pack_volumes(vol_A, vol_B):
    pA, _ = pack_volume(vol_A)
    pB, _ = pack_volume(vol_B)
    return pA, pB, pA.shape[1]


def pack_grid_planes(grid):
    """(Hg, Wg, 2) rotation grid -> (Hg, 256) f32 [x-plane | y-plane], each
    zero-padded to 128 lanes. Input to the grid-fused kernel."""
    Hg, Wg, _ = grid.shape
    assert Wg <= LANES, f"grid width {Wg} exceeds one lane row"
    g = jnp.pad(grid.astype(jnp.float32), ((0, 0), (0, LANES - Wg), (0, 0)))
    return jnp.concatenate([g[..., 0], g[..., 1]], axis=1)


def dccl_level_lookup_grid_fused(vol_A, vol_B, cen_A, cen_B, grid_A, grid_B,
                                 level_scale: float = 1.0,
                                 interpret: bool = False):
    """Fully fused own+cross DCCL lookup for one level, both branches, with
    the cross-view grid-window sampling (core/corr.py:132-133) computed
    in-kernel from the rotation grids — no coordinate round-trips through
    HBM and no grid-sampling einsums.

    vol_A, vol_B: (B, Q, Hl, Wl); cen_A, cen_B: (B, Q, 2) UNSCALED 1/8-res
    coords (scaled by ``level_scale`` in-kernel, the i>0 parity quirk);
    grid_A, grid_B: (Hg, Wg, 2) A->B / B->A world-to-camera rotation grids
    (Wg <= 128). Returns (own_A, cross_A, own_B, cross_B), each (B, Q, 81)
    f32 with tap order k = i*9 + j.
    """
    B, Q, Hl, Wl = vol_A.shape
    BQ = B * Q
    volA, volB, R = _pack_volumes(vol_A, vol_B)
    # the in-kernel grid stage adds per-tile strip/gather buffers: a smaller
    # volume-tile budget keeps double buffering within VMEM
    T = _pick_tile(BQ, R, budget=GRID_VMEM_BUDGET)
    Hg, Wg, _ = grid_A.shape
    gcatA = pack_grid_planes(grid_A)
    gcatB = pack_grid_planes(grid_B)
    cenA = cen_A.reshape(BQ, 2).astype(jnp.float32)
    cenB = cen_B.reshape(BQ, 2).astype(jnp.float32)
    outs = _grid_call(volA, volB, cenA, cenB, gcatA, gcatB, BQ, R, T,
                      Hl, Wl, Hg, Wg, float(level_scale), interpret,
                      emit_coords=False)
    return tuple(o[:, :NTAP].reshape(B, Q, NTAP) for o in outs)


def _grid_call(volA, volB, cenA, cenB, gcat_A, gcat_B, BQ, R, T,
               Hl, Wl, Hg, Wg, scale, interpret, emit_coords=True):
    kern = functools.partial(_dccl_grid_kernel, T=T, R=R, Hl=Hl, Wl=Wl,
                             Hg=Hg, Wg=Wg, scale=scale)
    row = lambda q: (q, 0)
    vol3 = lambda q: (q, 0, 0)
    const2 = lambda q: (0, 0)
    n_out = 8 if emit_coords else 4
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
        interpret=interpret,
    )(cenA, cenB, gcat_A, gcat_B, volA, volB)


def _one_hot_pair(coords, extent, wrap: bool):
    """(..., ) coords -> ((...,), (...,), (...,), mask2) integer corners and
    frac with the reference sampler's boundary rules. Helper for the VJP."""
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


def _scatter_grads(g, tapx, tapy, Hl, Wl, dtype):
    """Transpose of the tap sampler: accumulate tap grads into a volume.

    g: (B, Q, K) f32 tap cotangents; tapx/tapy: (B, Q, K) coords.
    Returns (B, Q, Hl, Wl). One-hot einsums (the transpose of a bilinear
    gather is a bilinear scatter, expressed MXU-style).
    """
    x0, x1, fx, _, mx1 = _one_hot_pair(tapx, Wl, wrap=True)
    y0, y1, fy, my0, my1 = _one_hot_pair(tapy, Hl, wrap=False)

    cols_w = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, Wl), 3)
    cols_h = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, Hl), 3)
    # (B, Q, K, Wl) and (B, Q, K, Hl) one-hot weight fields
    wx = (jnp.where(cols_w == x0[..., None], (1 - fx)[..., None], 0.0)
          + jnp.where(cols_w == x1[..., None], (fx * mx1)[..., None], 0.0))
    wy = (jnp.where(cols_h == y0[..., None], (my0 * (1 - fy))[..., None], 0.0)
          + jnp.where(cols_h == y1[..., None], (my1 * fy)[..., None], 0.0))
    gwx = wx * g[..., None]
    # operands follow the volume dtype (bf16 fast path / f32 parity path),
    # accumulation stays f32
    dv = jnp.einsum("bqkh,bqkw->bqhw", wy.astype(dtype), gwx.astype(dtype),
                    preferred_element_type=jnp.float32)
    return dv.astype(dtype)


def _repack(dv):
    """(B, Q, Hl, Wl) scatter result -> packed (B*Q, R, 128) cotangent."""
    p, _ = pack_volume(dv)
    return p


def _scatter_grads_window(g, cen, level_scale, Hl, Wl, dtype, radius=4):
    """Transpose of the OWN-window tap sampler, exploiting separability.

    The own taps form a (2r+1)x(2r+1) window around the level-scaled
    centre: tap k = i*9+j has x-offset i-r, y-offset j-r
    (core/corr.py:120-126). The scatter therefore factors into separable
    one-hot weight matrices — ~8x fewer FLOPs and ~10x smaller
    intermediates than the dense arbitrary-coordinate form below.

    g: (B, Q, K) f32 tap cotangents; cen: (B, Q, 2) UNSCALED centres.
    Returns (B, Q, Hl, Wl).
    """
    from ..corr import _window_weights

    n = 2 * radius + 1
    B, Q, K = g.shape
    gij = g.reshape(B, Q, n, n)  # [i (x-tap), j (y-tap)]
    wx = _window_weights(cen[..., 0] * level_scale, Wl, radius, wrap=True
                         ).astype(dtype)   # (B, Q, n, Wl)
    wy = _window_weights(cen[..., 1] * level_scale, Hl, radius, wrap=False
                         ).astype(dtype)   # (B, Q, n, Hl)
    tmp = jnp.einsum("bqjh,bqij->bqih", wy, gij.astype(dtype),
                     preferred_element_type=jnp.float32)
    dv = jnp.einsum("bqih,bqiw->bqhw", tmp.astype(dtype), wx,
                    preferred_element_type=jnp.float32)
    return dv.astype(dtype)


# ---------------------------------------------------------------------------
# Patch-local scatter (round-5 lever): shrink the one-hot H factor from Hl
# rows to a P-row patch at a per-query dynamic base, then place the patch
# back with a row GATHER (dv rows are query-private, so placement never
# collides). Exactness rests on a measured geometric bound, NOT the
# ~10-row claim of the round-4 design note — that claim is FALSE: the
# cycle sampler's zero-pad y-edges and its x-seam quirk (x0+1 == W
# contributes zero, utils.py:78-95) scale tap coords by per-query partial
# weights, sweeping them continuously toward 0, so the per-query
# contributing-corner row span at 512x1024 level 0 is 40 rows (per-(q,j):
# 26) — tools/measure_cross_span.py sweeps the real grids exhaustively.
# P = CROSS_PATCH_ROWS covers that span with margin; levels whose span
# reaches Hl (all levels > 0 at 512x1024) keep the dense path.
# ---------------------------------------------------------------------------

# 48 >= the measured worst-case span (40 at step-0.25 sweep) + margin.
# "0" disables the patch path (dense fallback everywhere).
#
# Default 0 (dense): the clean round-5 chip A/B at batch-4 production
# hparams measured PATCH=48 at 3374 ms/step vs PATCH=0 at 1843 ms/step
# (tools/bench_train_step.py --train-only --policy dccl, 2026-08-20).
# The FLOP saving is real (~4x fewer einsum FLOPs at level 0) but the
# per-query dynamic row-base turns the placement gathers into the
# batch-minormost layout pathology traced in docs/ARCHITECTURE.md §3 —
# a ~2x step regression. Kept as an opt-in for future layouts.
CROSS_PATCH_ROWS = int(os.environ.get("PRIORFLOW_SCATTER_PATCH", "0"))
OWN_PATCH_ROWS = 16  # own window touches <= 10 rows (floor(c)-4 .. floor(c)+5)


def _scatter_grads_patch(g, tapx, tapy, Hl, Wl, dtype, P):
    """`_scatter_grads` restricted to a P-row patch: returns
    (patch (B, Q, P, Wl), base (B, Q)) with
    place(patch, base) == _scatter_grads(...) whenever every contributing
    corner row fits in [base, base+P-1] (the measured span bound)."""
    x0, x1, fx, _, mx1 = _one_hot_pair(tapx, Wl, wrap=True)
    y0, y1, fy, my0, my1 = _one_hot_pair(tapy, Hl, wrap=False)
    w0 = my0 * (1.0 - fy)
    w1 = my1 * fy
    big = jnp.int32(Hl)
    cand = jnp.minimum(jnp.where(w0 > 0, y0, big), jnp.where(w1 > 0, y1, big))
    base = jnp.min(cand, axis=-1)                                # (B, Q)
    base = jnp.clip(jnp.where(base >= big, 0, base), 0, max(Hl - P, 0))

    l0 = y0 - base[..., None]
    l1 = y1 - base[..., None]
    cols_p = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, P), 3)
    wy = (jnp.where(cols_p == l0[..., None], w0[..., None], 0.0)
          + jnp.where(cols_p == l1[..., None], w1[..., None], 0.0))
    cols_w = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, Wl), 3)
    wx = (jnp.where(cols_w == x0[..., None], (1 - fx)[..., None], 0.0)
          + jnp.where(cols_w == x1[..., None], (fx * mx1)[..., None], 0.0))
    gwx = wx * g[..., None]
    patch = jnp.einsum("bqkp,bqkw->bqpw", wy.astype(dtype),
                       gwx.astype(dtype),
                       preferred_element_type=jnp.float32)
    return patch.astype(dtype), base


def _scatter_grads_window_patch(g, cen, level_scale, Hl, Wl, dtype, P,
                                radius=4):
    """`_scatter_grads_window` with the H one-hot factor shrunk to a P-row
    patch at base = clip(floor(scaled centre) - radius). The own window's
    corner rows live in [floor(c)-r, floor(c)+r+1] — 2r+2 = 10 rows — so
    P=16 always covers them. Returns (patch (B, Q, P, Wl), base (B, Q))."""
    from ..corr import _window_weights

    n = 2 * radius + 1
    B, Q, K = g.shape
    gij = g.reshape(B, Q, n, n)  # [i (x-tap), j (y-tap)]
    ty = cen[..., 1] * level_scale  # own window y is NOT wrapped
    base = jnp.clip(jnp.floor(ty).astype(jnp.int32) - radius,
                    0, max(Hl - P, 0))                           # (B, Q)

    # local-window one-hot: same construction as _window_weights but with
    # columns base..base+P-1; corners outside [0, Hl-1] fall outside the
    # clipped patch and thus contribute zero, matching the full-width form
    t0 = jnp.floor(ty)
    frac = (ty - t0)[..., None, None]                            # (B,Q,1,1)
    d = jnp.arange(n, dtype=jnp.float32) - radius                # (n,)
    corner = t0[..., None] + d                                   # (B,Q,n)
    cols = (jax.lax.broadcasted_iota(jnp.float32, (1, 1, 1, P), 3)
            + base[..., None, None].astype(jnp.float32))         # (B,Q,1,P)
    c = corner[..., None]                                        # (B,Q,n,1)
    wy = (jnp.where(cols == c, 1.0 - frac, 0.0)
          + jnp.where(cols == c + 1.0, frac, 0.0))               # (B,Q,n,P)

    wx = _window_weights(cen[..., 0] * level_scale, Wl, radius, wrap=True
                         ).astype(dtype)                         # (B,Q,n,Wl)
    tmp = jnp.einsum("bqjp,bqij->bqip", wy.astype(dtype), gij.astype(dtype),
                     preferred_element_type=jnp.float32)
    patch = jnp.einsum("bqip,bqiw->bqpw", tmp.astype(dtype), wx,
                       preferred_element_type=jnp.float32)
    return patch.astype(dtype), base


def _place_patches(Hl, *patches_and_bases):
    """Sum of P-row patches placed at per-query row bases:
    out[b,q,h,w] = sum_i patch_i[b,q,h-base_i,w] (rows outside a patch
    contribute zero). One fused output pass: each gather is a contiguous
    Wl-lane row read, the efficient kind of gather on TPU."""
    out = None
    rows = None
    for patch, base in patches_and_bases:
        B, Q, P, Wl = patch.shape
        if rows is None:
            rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Hl), 2)
        idx = rows - base[..., None]                             # (B,Q,Hl)
        valid = (idx >= 0) & (idx < P)
        g = jnp.take_along_axis(patch, jnp.clip(idx, 0, P - 1)[..., None],
                                axis=2)
        term = jnp.where(valid[..., None], g, jnp.zeros((), patch.dtype))
        out = term if out is None else out + term
    return out


def _scatter_own_cross(g_own, cen, level_scale, g_cross, cx, cy,
                       Hl, Wl, dtype):
    """One volume's combined cotangent: own-window scatter + cross-tap
    scatter, patch-local when the level is large enough to profit
    (Hl > CROSS_PATCH_ROWS — at 512x1024 that is level 0 only; the
    measured per-query cross span REACHES Hl at the pooled levels, see
    tools/measure_cross_span.py). Numerics == the dense pair."""
    P = CROSS_PATCH_ROWS
    if not P or Hl <= P:
        return (_scatter_grads_window(g_own, cen, level_scale, Hl, Wl, dtype)
                + _scatter_grads(g_cross, cx, cy, Hl, Wl, dtype))
    pc, bc = _scatter_grads_patch(g_cross, cx, cy, Hl, Wl, dtype, P)
    po, bo = _scatter_grads_window_patch(g_own, cen, level_scale, Hl, Wl,
                                         dtype, OWN_PATCH_ROWS)
    return _place_patches(Hl, (pc, bc), (po, bo))


# ---------------------------------------------------------------------------
# differentiable wrapper: gradients flow to the volumes only (lookup coords
# are stop_gradiented upstream each GRU iteration, core/prior_raft.py:171)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def dccl_packed_lookup(pA, pB, meta_A, meta_B, cen_A, cen_B,
                       cross_A, cross_B, level_scale: float = 1.0,
                       interpret: bool = False):
    """Differentiable fused DCCL level lookup on PRE-PACKED volumes.

    pA, pB: ``pack_volume`` outputs (B*Q, R, 128); meta_A/meta_B their
    zero-size extent carriers. Gradients propagate to the packed volumes
    only; coordinates are constants (they are stop_gradiented in the model
    step, mirroring the reference's per-iteration ``coords1.detach()``,
    core/prior_raft.py:171-177).
    """
    _, Hl, Wl = meta_A.shape
    return _packed_call_coords(pA, pB, Hl, Wl, cen_A, cen_B,
                               cross_A, cross_B, level_scale, interpret)


def _packed_fwd(pA, pB, meta_A, meta_B, cen_A, cen_B, cross_A, cross_B,
                level_scale, interpret):
    _, Hl, Wl = meta_A.shape
    out = _packed_call_coords(pA, pB, Hl, Wl, cen_A, cen_B,
                              cross_A, cross_B, level_scale, interpret)
    return out, (meta_A, meta_B, cen_A, cen_B, cross_A, cross_B)


def _packed_bwd(level_scale, interpret, res, cts):
    meta_A, meta_B, cen_A, cen_B, cross_A, cross_B = res
    g_ownA, g_crossA, g_ownB, g_crossB = cts
    _, Hl, Wl = meta_A.shape
    # Separable own-window scatter + cross scatter (patch-local at level 0,
    # _scatter_own_cross), as one-hot einsums. A fused Pallas
    # matmul-scatter kernel was built and measured SLOWER (102.7 vs 13.7
    # ms/iter at level 0, tools/bench_scatter.py): the one-hot contraction
    # FLOPs dwarf the HBM traffic they avoid.
    d_pA = _repack(_scatter_own_cross(
        g_ownA, cen_A, level_scale,
        g_crossB, cross_B[..., 0], cross_B[..., 1], Hl, Wl, meta_A.dtype))
    d_pB = _repack(_scatter_own_cross(
        g_ownB, cen_B, level_scale,
        g_crossA, cross_A[..., 0], cross_A[..., 1], Hl, Wl, meta_B.dtype))
    return (d_pA, d_pB, None, None, None, None, None, None)


dccl_packed_lookup.defvjp(_packed_fwd, _packed_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def dccl_packed_lookup_planes(pA, pB, meta_A, meta_B, cen_A, cen_B,
                              cAx, cAy, cBx, cBy,
                              level_scale: float = 1.0,
                              interpret: bool = False):
    """``dccl_packed_lookup`` with the cross-view tap coords passed as
    PRE-PADDED per-channel planes (B*Q, 128) — the layout the kernel
    consumes directly. The channels-last (B, Q, 81, 2) form costs two
    full-tensor relayout copies per branch per iteration just to slice the
    channels back out (measured ~18 ms/forward at 512x1024)."""
    _, Hl, Wl = meta_A.shape
    return _packed_call_planes(pA, pB, Hl, Wl, cen_A, cen_B,
                               cAx, cAy, cBx, cBy, level_scale, interpret)


def _packed_planes_fwd(pA, pB, meta_A, meta_B, cen_A, cen_B,
                       cAx, cAy, cBx, cBy, level_scale, interpret):
    _, Hl, Wl = meta_A.shape
    out = _packed_call_planes(pA, pB, Hl, Wl, cen_A, cen_B,
                              cAx, cAy, cBx, cBy, level_scale, interpret)
    return out, (meta_A, meta_B, cen_A, cen_B, cAx, cAy, cBx, cBy)


def _packed_planes_bwd(level_scale, interpret, res, cts):
    meta_A, meta_B, cen_A, cen_B, cAx, cAy, cBx, cBy = res
    g_ownA, g_crossA, g_ownB, g_crossB = cts
    _, Hl, Wl = meta_A.shape
    B, Q = cen_A.shape[:2]
    unpad = lambda p: p[:, :NTAP].reshape(B, Q, NTAP)
    d_pA = _repack(_scatter_own_cross(
        g_ownA, cen_A, level_scale,
        g_crossB, unpad(cBx), unpad(cBy), Hl, Wl, meta_A.dtype))
    d_pB = _repack(_scatter_own_cross(
        g_ownB, cen_B, level_scale,
        g_crossA, unpad(cAx), unpad(cAy), Hl, Wl, meta_B.dtype))
    return (d_pA, d_pB, None, None, None, None, None, None, None, None)


dccl_packed_lookup_planes.defvjp(_packed_planes_fwd, _packed_planes_bwd)


def _packed_grid_primal(pA, pB, meta_A, cen_A, cen_B, grid_A, grid_B,
                        level_scale, interpret, emit_coords=True):
    _, Hl, Wl = meta_A.shape
    BQ, R, _ = pA.shape
    B, Q = cen_A.shape[:2]
    T = _pick_tile(BQ, R, budget=GRID_VMEM_BUDGET,
                   elem_bytes=3 if pA.dtype == jnp.bfloat16 else 6)
    Hg, Wg, _ = grid_A.shape
    gcatA = pack_grid_planes(grid_A)
    gcatB = pack_grid_planes(grid_B)
    cenA = cen_A.reshape(BQ, 2).astype(jnp.float32)
    cenB = cen_B.reshape(BQ, 2).astype(jnp.float32)
    return _grid_call(pA, pB, cenA, cenB, gcatA, gcatB, BQ, R, T,
                      Hl, Wl, Hg, Wg, float(level_scale), interpret,
                      emit_coords=emit_coords)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def dccl_packed_lookup_grid(pA, pB, meta_A, meta_B, cen_A, cen_B,
                            grid_A, grid_B, level_scale: float = 1.0,
                            interpret: bool = False):
    """``dccl_packed_lookup`` with the cross-view grid-window sampling
    computed in-kernel (see dccl_level_lookup_grid_fused)."""
    outs = _packed_grid_primal(pA, pB, meta_A, cen_A, cen_B, grid_A, grid_B,
                               level_scale, interpret, emit_coords=False)
    B, Q = cen_A.shape[:2]
    return tuple(o[:, :NTAP].reshape(B, Q, NTAP) for o in outs)


def _packed_grid_fwd(pA, pB, meta_A, meta_B, cen_A, cen_B, grid_A, grid_B,
                     level_scale, interpret):
    from jax.ad_checkpoint import checkpoint_name

    outs = _packed_grid_primal(pA, pB, meta_A, cen_A, cen_B, grid_A, grid_B,
                               level_scale, interpret)
    B, Q = cen_A.shape[:2]
    corr = tuple(o[:, :NTAP].reshape(B, Q, NTAP) for o in outs[:4])
    # name the residual tap coords so the model's remat policy can SAVE
    # them: without this, the backward replays the whole Pallas kernel just
    # to regenerate its residuals (~220 ms/step at 512x1024 batch 4)
    cAx, cAy, cBx, cBy = (checkpoint_name(o, "dccl_coords")
                          for o in outs[4:])
    return corr, (meta_A, meta_B, cen_A, cen_B, cAx, cAy, cBx, cBy)


def _packed_grid_bwd(level_scale, interpret, res, cts):
    meta_A, meta_B, cen_A, cen_B, cAx, cAy, cBx, cBy = res
    g_ownA, g_crossA, g_ownB, g_crossB = cts
    _, Hl, Wl = meta_A.shape
    B, Q = cen_A.shape[:2]
    unpad = lambda p: p[:, :NTAP].reshape(B, Q, NTAP)

    # Separable own-window scatter + cross scatter at the exact tap coords
    # the forward kernel emitted (patch-local at level 0,
    # _scatter_own_cross), as one-hot einsums. A fused Pallas
    # matmul-scatter kernel was built and measured SLOWER (102.7 vs 13.7
    # ms/iter at level 0, tools/bench_scatter.py): the one-hot contraction
    # FLOPs dwarf the HBM traffic they avoid.
    d_pA = _repack(_scatter_own_cross(
        g_ownA, cen_A, level_scale,
        g_crossB, unpad(cBx), unpad(cBy), Hl, Wl, meta_A.dtype))
    d_pB = _repack(_scatter_own_cross(
        g_ownB, cen_B, level_scale,
        g_crossA, unpad(cAx), unpad(cAy), Hl, Wl, meta_B.dtype))
    return (d_pA, d_pB, None, None, None, None, None, None)


dccl_packed_lookup_grid.defvjp(_packed_grid_fwd, _packed_grid_bwd)


# ------------------------ all-levels fused call -----------------------------

def _grid_all_call(pAs, pBs, metas, cen_A, cen_B, grid_A, grid_B, scales,
                   interpret, emit_coords):
    BQ = pAs[0].shape[0]
    Rs = tuple(p.shape[1] for p in pAs)
    Hls = tuple(m.shape[1] for m in metas)
    Wls = tuple(m.shape[2] for m in metas)
    L = len(Rs)
    bf16 = all(p.dtype == jnp.bfloat16 for p in pAs)
    T = _pick_tile(BQ, sum(Rs), budget=GRID_VMEM_BUDGET,
                   elem_bytes=3 if bf16 else 6)
    Hg, Wg, _ = grid_A.shape
    gcatA = pack_grid_planes(grid_A)
    gcatB = pack_grid_planes(grid_B)
    cenA = cen_A.reshape(BQ, 2).astype(jnp.float32)
    cenB = cen_B.reshape(BQ, 2).astype(jnp.float32)

    kern = functools.partial(_dccl_grid_kernel_all, T=T, Rs=Rs, Hls=Hls,
                             Wls=Wls, Hg=Hg, Wg=Wg,
                             scales=tuple(float(s) for s in scales),
                             emit_coords=emit_coords)
    row = lambda q: (q, 0)
    vol3 = lambda q: (q, 0, 0)
    const2 = lambda q: (0, 0)
    n_out = 8 * L if emit_coords else 4 * L
    vols = []
    vol_specs = []
    for l in range(L):
        vols += [pAs[l], pBs[l]]
        vol_specs += [pl.BlockSpec((T, Rs[l], LANES), vol3,
                                   memory_space=pltpu.VMEM)] * 2
    return pl.pallas_call(
        kern,
        grid=(BQ // T,),
        in_specs=[
            pl.BlockSpec((T, 2), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 2), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hg, 2 * LANES), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hg, 2 * LANES), const2, memory_space=pltpu.VMEM),
        ] + vol_specs,
        out_specs=tuple(
            pl.BlockSpec((T, LANES), row, memory_space=pltpu.VMEM)
            for _ in range(n_out)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((BQ, LANES), jnp.float32)
            for _ in range(n_out)),
        interpret=interpret,
    )(cenA, cenB, gcatA, gcatB, *vols)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def dccl_packed_lookup_grid_all(packedA, packedB, metas, cen_A, cen_B,
                                grids, scales, interpret: bool = False):
    """All pyramid levels' fused both-branch lookups in ONE kernel launch.

    packedA/packedB: tuples of ``pack_volume`` outputs per level; metas:
    their extent carriers; grids: (grid_A, grid_B); scales: static
    per-level centre scales (nondiff). Returns a tuple of per-level
    (own_A, cross_A, own_B, cross_B), each (B, Q, 81) f32.
    """
    grid_A, grid_B = grids
    outs = _grid_all_call(packedA, packedB, metas, cen_A, cen_B,
                          grid_A, grid_B, scales, interpret,
                          emit_coords=False)
    B, Q = cen_A.shape[:2]
    un = lambda o: o[:, :NTAP].reshape(B, Q, NTAP)
    L = len(packedA)
    return tuple(tuple(un(o) for o in outs[4 * l:4 * l + 4])
                 for l in range(L))


def _packed_grid_all_fwd(packedA, packedB, metas, cen_A, cen_B, grids,
                         scales, interpret):
    from jax.ad_checkpoint import checkpoint_name

    grid_A, grid_B = grids
    outs = _grid_all_call(packedA, packedB, metas, cen_A, cen_B,
                          grid_A, grid_B, scales, interpret,
                          emit_coords=True)
    B, Q = cen_A.shape[:2]
    un = lambda o: o[:, :NTAP].reshape(B, Q, NTAP)
    L = len(packedA)
    corr = tuple(tuple(un(o) for o in outs[4 * l:4 * l + 4])
                 for l in range(L))
    coords = tuple(checkpoint_name(o, "dccl_coords")
                   for o in outs[4 * L:])
    return corr, (metas, cen_A, cen_B, coords)


def _packed_grid_all_bwd(scales, interpret, res, cts):
    metas, cen_A, cen_B, coords = res
    B, Q = cen_A.shape[:2]
    unpad = lambda p: p[:, :NTAP].reshape(B, Q, NTAP)
    d_pA, d_pB = [], []
    for l, meta in enumerate(metas):
        _, Hl, Wl = meta.shape
        g_ownA, g_crossA, g_ownB, g_crossB = cts[l]
        cAx, cAy, cBx, cBy = coords[4 * l:4 * l + 4]
        d_pA.append(_repack(_scatter_own_cross(
            g_ownA, cen_A, scales[l],
            g_crossB, unpad(cBx), unpad(cBy), Hl, Wl, meta.dtype)))
        d_pB.append(_repack(_scatter_own_cross(
            g_ownB, cen_B, scales[l],
            g_crossA, unpad(cAx), unpad(cAy), Hl, Wl, meta.dtype)))
    return (tuple(d_pA), tuple(d_pB), None, None, None, None)


dccl_packed_lookup_grid_all.defvjp(_packed_grid_all_fwd,
                                   _packed_grid_all_bwd)


# ------------------- deferred cross-iteration volume grads -----------------
#
# The GRU scan's per-iteration DCCL backward materialises a volume-shaped
# cotangent (B, Q, Hl, Wl) per branch per level per ITERATION and the scan
# transpose accumulates them — at 512x1024 batch 4 that is ~12x2x0.7 GB of
# HBM writes plus K=81 one-hot einsums too small to feed the MXU well. But
# the lookup is LINEAR in the volume (coords are stop_gradiented each
# iteration, reference core/prior_raft.py:171), so the total volume
# cotangent is one big scatter over ALL iterations' taps:
#
#   d_vol = sum_s S_s^T g_s            (S_s = iteration s's sampling matrix)
#
# The deferred path (models/prior_raft.py, deferred_vol_grad=True) records
# every iteration's lookup results + tap coords in a no-grad trajectory
# pass, re-binds the recorded taps to the volumes through
# ``dccl_deferred_rebind`` below, and replays the GRU scan with the taps as
# scanned inputs. The rebind's custom VJP then runs ONE stacked scatter per
# level/branch with contraction size S*81 (= 972 at 12 iterations) instead
# of 12 accumulated K=81 scatters: volume-shaped intermediates materialise
# once, and the one-hot contraction is long enough to keep the MXU busy.

# transient one-hot field budget for the stacked scatters (bytes); the Q
# axis is chunked so S*B*qc*K*(Hl + 2*Wl) field elements stay under it
DEFERRED_SCATTER_BUDGET = int(os.environ.get(
    "PRIORFLOW_DEFERRED_SCATTER_BUDGET", str(512 * 1024 * 1024)))


def _coords_kernel(cen_ref, g_ref, cx_ref, cy_ref, *, T, Hg, Wg, scale):
    cx, cy = _grid_window(g_ref[:], cen_ref[:], T, Hg, Wg, scale)
    cx_ref[:] = cx
    cy_ref[:] = cy


def dccl_grid_coords(cen, gcat, Wg: int, level_scale: float,
                     interpret: bool = False):
    """Standalone grid-window tap coords: the lookup kernel's in-kernel
    ``_grid_window`` stage as its own (coords-only) kernel.

    cen: (N, 2) f32 UNSCALED centres; gcat: ``pack_grid_planes`` output
    (Hg, 256); Wg: the grid's valid width. Returns (cx, cy) planes
    (N, 128) f32, slots k = i*9 + j — BIT-IDENTICAL to the planes the
    lookup kernel emits for the same centres (same op sequence: the
    one-hot row fetch is an exact f32 select-sum and the blends/gathers
    are deterministic), so the deferred volume-gradient backward can
    RECOMPUTE the scatter targets instead of holding S iterations of
    taped coord planes in HBM (~3.2 GB at 512x1024 batch 4)."""
    N = cen.shape[0]
    Hg = gcat.shape[0]
    # _grid_window's transients (one-hot row matrix, sampled strips, blend
    # rows) scale with T*10*(Hg + 4*LANES) f32 — T=512 tripped the 16 MB
    # scoped-VMEM stack limit on v5e, T<=128 leaves 4x headroom (and the
    # sweeps showed per-grid-step fixed cost is not the binding term)
    T = 1
    for t in _TILE_SIZES:
        if t <= 128 and N % t == 0:
            T = t
            break
    kern = functools.partial(_coords_kernel, T=T, Hg=Hg, Wg=Wg,
                             scale=float(level_scale))
    row = lambda q: (q, 0)
    return pl.pallas_call(
        kern,
        grid=(N // T,),
        in_specs=[
            pl.BlockSpec((T, 2), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((Hg, 2 * LANES), lambda q: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((T, LANES), row, memory_space=pltpu.VMEM)
            for _ in range(2)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((N, LANES), jnp.float32) for _ in range(2)),
        interpret=interpret,
    )(cen.astype(jnp.float32), gcat)


def dccl_lookup_grid_record(pA, pB, meta_A, cen_A, cen_B, grid_A, grid_B,
                            level_scale: float = 1.0,
                            interpret: bool = False):
    """Primal-only grid-fused lookup for the deferred recording pass. No
    VJP — callers run this under ``stop_gradient``; the deferred backward
    RECOMPUTES the cross tap coords from the centres via
    ``dccl_grid_coords`` (bit-identical), so no coord planes are emitted
    or taped (saves ~3.2 GB of scan-stacked HBM at 512x1024 batch 4).

    Returns ``(own_A, cross_A, own_B, cross_B)``, each (B, Q, 81) f32."""
    outs = _packed_grid_primal(pA, pB, meta_A, cen_A, cen_B, grid_A, grid_B,
                               level_scale, interpret, emit_coords=False)
    B, Q = cen_A.shape[:2]
    return tuple(o[:, :NTAP].reshape(B, Q, NTAP) for o in outs)


def _chunk_q(Q, per_q_bytes):
    """Largest power-of-two divisor of Q whose field bytes fit the budget."""
    qc = 1
    while qc < Q and Q % (qc * 2) == 0 \
            and (qc * 2) * per_q_bytes <= DEFERRED_SCATTER_BUDGET:
        qc *= 2
    return qc


def _scatter_grads_multi(g, tapx, tapy, Hl, Wl, dtype):
    """Stacked transpose of the cross-tap sampler over S iterations.

    g/tapx/tapy: (S, B, Q, K). Returns (B, Q, Hl, Wl) = the SUM over S of
    the per-iteration bilinear scatters, computed as one einsum contracting
    (S*K) — identical weights/coords semantics to ``_scatter_grads``, but
    the contraction is long enough for the MXU and the volume-shaped output
    materialises once. Q is chunked to bound the one-hot field transients.
    """
    S, B, Q, K = g.shape
    esz = 2 if dtype == jnp.bfloat16 else 4
    qc = _chunk_q(Q, S * B * K * (Hl + 2 * Wl) * esz)

    def chunk(gc, xc, yc):
        x0, x1, fx, _, mx1 = _one_hot_pair(xc, Wl, wrap=True)
        y0, y1, fy, my0, my1 = _one_hot_pair(yc, Hl, wrap=False)
        cols_w = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, Wl), 4)
        cols_h = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, Hl), 4)
        wx = (jnp.where(cols_w == x0[..., None], (1 - fx)[..., None], 0.0)
              + jnp.where(cols_w == x1[..., None], (fx * mx1)[..., None],
                          0.0))
        wy = (jnp.where(cols_h == y0[..., None],
                        (my0 * (1 - fy))[..., None], 0.0)
              + jnp.where(cols_h == y1[..., None],
                          (my1 * fy)[..., None], 0.0))
        gwx = wx * gc[..., None]
        dv = jnp.einsum("sbqkh,sbqkw->bqhw", wy.astype(dtype),
                        gwx.astype(dtype),
                        preferred_element_type=jnp.float32)
        return dv.astype(dtype)

    if qc == Q:
        return chunk(g, tapx, tapy)
    out0 = jnp.zeros((B, Q, Hl, Wl), dtype)

    def body(i, out):
        sl = i * qc
        sub = lambda a: jax.lax.dynamic_slice_in_dim(a, sl, qc, axis=2)
        dv = chunk(sub(g), sub(tapx), sub(tapy))
        return jax.lax.dynamic_update_slice_in_dim(out, dv, sl, axis=1)

    return jax.lax.fori_loop(0, Q // qc, body, out0)


def _scatter_grads_window_multi(g, cen, level_scale, Hl, Wl, dtype,
                                radius=4):
    """Stacked transpose of the OWN-window sampler over S iterations.

    g: (S, B, Q, K); cen: (S, B, Q, 2) UNSCALED centres. Separable per
    iteration (the own taps are an axis-aligned window,
    ``_scatter_grads_window``); the second einsum contracts (S * (2r+1))
    jointly so the volume-shaped output materialises once.
    Returns (B, Q, Hl, Wl)."""
    from ..corr import _window_weights

    n = 2 * radius + 1
    S, B, Q, K = g.shape
    esz = 2 if dtype == jnp.bfloat16 else 4
    qc = _chunk_q(Q, S * B * n * (2 * Hl + Wl + n) * esz)

    def chunk(gc, cc):
        gij = gc.reshape(S, B, -1, n, n)  # [i (x-tap), j (y-tap)]
        wx = _window_weights(cc[..., 0] * level_scale, Wl, radius,
                             wrap=True).astype(dtype)    # (S,B,q,n,Wl)
        wy = _window_weights(cc[..., 1] * level_scale, Hl, radius,
                             wrap=False).astype(dtype)   # (S,B,q,n,Hl)
        tmp = jnp.einsum("sbqjh,sbqij->sbqih", wy, gij.astype(dtype),
                         preferred_element_type=jnp.float32)
        dv = jnp.einsum("sbqih,sbqiw->bqhw", tmp.astype(dtype), wx,
                        preferred_element_type=jnp.float32)
        return dv.astype(dtype)

    if qc == Q:
        return chunk(g, cen)
    out0 = jnp.zeros((B, Q, Hl, Wl), dtype)

    def body(i, out):
        sl = i * qc
        sub = lambda a: jax.lax.dynamic_slice_in_dim(a, sl, qc, axis=2)
        dv = chunk(sub(g), sub(cen))
        return jax.lax.dynamic_update_slice_in_dim(out, dv, sl, axis=1)

    return jax.lax.fori_loop(0, Q // qc, body, out0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _rebind(planTA, planTB, scales, Wg, pyrA, pyrB, taps_A, taps_B,
            cen_A, cen_B, gcatA, gcatB):
    """Identity on the recorded taps; gradients flow to the volumes only.

    planTA/planTB: ``static_resample.transpose_plan`` objects (identity-
    hashed) for branch A's / B's cross back-rotations (grids b2a_8 / a2b_8);
    scales: static per-level centre scales; Wg: the rotation grids' valid
    width. pyrA/pyrB: tuples of (packed, meta) per level; taps_*:
    (S, B, h1, w1, L*81) f32 recorded own+cross sums; cen_*: (S, B, Q, 2);
    gcatA/gcatB: ``pack_grid_planes`` of the A->B / B->A world-to-camera
    grids — the backward recomputes the cross tap coords from these via
    ``dccl_grid_coords`` instead of taping S iterations of coord planes."""
    return taps_A, taps_B


def _rebind_fwd(planTA, planTB, scales, Wg, pyrA, pyrB, taps_A, taps_B,
                cen_A, cen_B, gcatA, gcatB):
    metas = tuple(m for _, m in pyrA)
    res = (metas, cen_A, cen_B, gcatA, gcatB)
    return (taps_A, taps_B), res


def _rebind_bwd(planTA, planTB, scales, Wg, res, cts):
    from ..static_resample import apply_transpose

    metas, cen_A, cen_B, gcatA, gcatB = res
    gA, gB = cts                       # (S, B, h1, w1, L*81) f32
    S, B, h1, w1, _ = gA.shape
    Q = h1 * w1
    L = len(metas)
    interpret = jax.default_backend() != "tpu"
    # transpose of the cross back-rotation (resample_static in _finish):
    # own and cross were SUMMED, so both read the same output cotangent
    flat = lambda g: g.reshape(S * B, h1, w1, -1)
    gA_cross = apply_transpose(planTA, flat(gA)).reshape(S, B, Q, -1)
    gB_cross = apply_transpose(planTB, flat(gB)).reshape(S, B, Q, -1)
    gA_own = gA.reshape(S, B, Q, -1)
    gB_own = gB.reshape(S, B, Q, -1)

    cenA_flat = cen_A.reshape(S * B * Q, 2)
    cenB_flat = cen_B.reshape(S * B * Q, 2)
    taps4 = lambda p: p[:, :NTAP].reshape(S, B, Q, NTAP)

    d_pA, d_pB = [], []
    for l in range(L):
        _, Hl, Wl = metas[l].shape
        dt = metas[l].dtype
        # recompute this level's cross tap coords (bit-identical to the
        # planes the recording kernel computed: same _grid_window ops)
        cAx, cAy = dccl_grid_coords(cenA_flat, gcatA, Wg, scales[l],
                                    interpret)
        cBx, cBy = dccl_grid_coords(cenB_flat, gcatB, Wg, scales[l],
                                    interpret)
        sl = slice(l * NTAP, (l + 1) * NTAP)
        d_pA.append(_repack(
            _scatter_grads_window_multi(gA_own[..., sl], cen_A, scales[l],
                                        Hl, Wl, dt)
            + _scatter_grads_multi(gB_cross[..., sl], taps4(cBx), taps4(cBy),
                                   Hl, Wl, dt)))
        d_pB.append(_repack(
            _scatter_grads_window_multi(gB_own[..., sl], cen_B, scales[l],
                                        Hl, Wl, dt)
            + _scatter_grads_multi(gA_cross[..., sl], taps4(cAx), taps4(cAy),
                                   Hl, Wl, dt)))

    # cotangents: volumes get the stacked scatters; every recorded input
    # (taps, centres, packed grids) is upstream of a stop_gradient, so its
    # cotangent is a dead zero XLA removes
    d_pyrA = tuple((d_pA[l], jnp.zeros(metas[l].shape, metas[l].dtype))
                   for l in range(L))
    d_pyrB = tuple((d_pB[l], jnp.zeros(metas[l].shape, metas[l].dtype))
                   for l in range(L))
    d_tapsA = jnp.zeros(gA.shape, gA.dtype)
    d_tapsB = jnp.zeros(gB.shape, gB.dtype)
    d_cenA = jnp.zeros(cen_A.shape, cen_A.dtype)
    d_cenB = jnp.zeros(cen_B.shape, cen_B.dtype)
    d_gcatA = jnp.zeros(gcatA.shape, gcatA.dtype)
    d_gcatB = jnp.zeros(gcatB.shape, gcatB.dtype)
    return (d_pyrA, d_pyrB, d_tapsA, d_tapsB, d_cenA, d_cenB,
            d_gcatA, d_gcatB)


_rebind.defvjp(_rebind_fwd, _rebind_bwd)


def dccl_deferred_rebind(pyr_A, pyr_B, taps_A, taps_B, cen_A, cen_B,
                         grid_A, grid_B, a2b_8, b2a_8, scales):
    """Re-bind no-grad recorded DCCL taps to the packed volumes.

    Forward: identity on ``taps_A``/``taps_B``. Backward: ONE stacked
    scatter per level/branch over all S iterations (see the section
    comment), with the scatter targets RECOMPUTED from the centres + the
    world-to-camera grids ``grid_A``/``grid_B`` (a2b_w2c_8 / b2a_w2c_8 —
    the grids the recording lookup sampled). ``a2b_8``/``b2a_8`` are the
    HOST-constant rotation grids the recording pass back-rotated with."""
    from ..static_resample import transpose_plan

    h1, w1 = taps_A.shape[2:4]
    planTA = transpose_plan(b2a_8, (h1, w1))
    planTB = transpose_plan(a2b_8, (h1, w1))
    gA = jnp.asarray(grid_A)
    gB = jnp.asarray(grid_B)
    gA3 = gA[0] if gA.ndim == 4 else gA
    gB3 = gB[0] if gB.ndim == 4 else gB
    Wg = gA3.shape[1]
    return _rebind(planTA, planTB, tuple(float(s) for s in scales), Wg,
                   tuple(pyr_A), tuple(pyr_B), taps_A, taps_B,
                   cen_A, cen_B, pack_grid_planes(gA3),
                   pack_grid_planes(gB3))


# --------------------------- 4D convenience API ----------------------------

def dccl_level_lookup(vol_A, vol_B, cen_A, cen_B, cross_A, cross_B,
                      level_scale: float = 1.0, interpret: bool = False):
    """Differentiable fused DCCL level lookup on (B, Q, Hl, Wl) volumes.

    Thin wrapper over ``dccl_packed_lookup``; volume gradients flow back
    through the (reshape/pad) packing automatically.
    """
    pA, mA = pack_volume(vol_A)
    pB, mB = pack_volume(vol_B)
    return dccl_packed_lookup(pA, pB, mA, mB, cen_A, cen_B,
                              cross_A, cross_B, level_scale, interpret)


def dccl_level_lookup_grid(vol_A, vol_B, cen_A, cen_B, grid_A, grid_B,
                           level_scale: float = 1.0,
                           interpret: bool = False):
    """Differentiable fully-fused DCCL level lookup (grid sampling
    in-kernel) on (B, Q, Hl, Wl) volumes."""
    pA, mA = pack_volume(vol_A)
    pB, mB = pack_volume(vol_B)
    return dccl_packed_lookup_grid(pA, pB, mA, mB, cen_A, cen_B,
                                   grid_A, grid_B, level_scale, interpret)
