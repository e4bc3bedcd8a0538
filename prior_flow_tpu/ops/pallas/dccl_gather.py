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
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
NTAP = 81  # (2*radius+1)**2 with radius 4


def _row_select(g, rsel, R):
    """Per-(tile,lane) row selection from ``g`` (T, R, S) f32.

    rsel: (T, S) int32 in [0, R). Binary halving network down to 8 rows
    (sublane-aligned static slices), then a one-hot reduce. R must be a
    power of two (volume extents are).
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
        return jnp.sum(jnp.where(oh, cur, 0.0), axis=1)
    return cur[:, 0, :]


def _sample_taps(Vflat, T, R, Hl, Wl, tapx, tapy):
    """Bilinear sample of per-query packed volume rows at per-tap coords.

    Vflat: (T*R, 128) f32; tapx/tapy: (T, 128) f32 (extra slots ignored).
    Semantics == cycle_bilinear_sampler: x wrapped mod Wl with the zero
    blend at the (Wl-1, Wl) seam; y zero-padded outside [0, Hl-1].
    Returns (T, 128) f32.
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

    def gather(lane):
        idx = jnp.broadcast_to(lane[:, None, :], (T, R, LANES)
                               ).reshape(T * R, LANES)
        return jnp.take_along_axis(Vflat, idx, axis=1).reshape(T, R, LANES)

    # packed layout: flat = y*Wl + x -> row = flat // 128, lane = flat % 128
    if Wl >= LANES and Wl % LANES == 0:
        # lane index is independent of y: share the gathers across the two
        # y-corners (2 gathers instead of 4)
        nb = Wl // LANES
        g0 = gather(x0i % LANES)
        g1 = gather(x1i % LANES)
        v00 = _row_select(g0, y0c * nb + x0i // LANES, R)
        v10 = _row_select(g0, y1c * nb + x0i // LANES, R)
        v01 = _row_select(g1, y0c * nb + x1i // LANES, R)
        v11 = _row_select(g1, y1c * nb + x1i // LANES, R)
    else:
        def corner(yc, xc):
            flat = yc * Wl + xc
            return _row_select(gather(flat % LANES), flat // LANES, R)

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


def _dccl_kernel(cenA_ref, cenB_ref, cAx_ref, cAy_ref, cBx_ref, cBy_ref,
                 volA_ref, volB_ref,
                 ownA_ref, crossA_ref, ownB_ref, crossB_ref,
                 *, T, R, Hl, Wl, scale):
    VA = volA_ref[:].astype(jnp.float32).reshape(T * R, LANES)
    VB = volB_ref[:].astype(jnp.float32).reshape(T * R, LANES)

    ax, ay = _own_taps(cenA_ref[:], scale)
    ownA_ref[:] = _sample_taps(VA, T, R, Hl, Wl, ax, ay)
    # branch B's cross-view taps land in volume A (core/corr.py:132-136)
    crossB_ref[:] = _sample_taps(VA, T, R, Hl, Wl, cBx_ref[:], cBy_ref[:])

    bx, by = _own_taps(cenB_ref[:], scale)
    ownB_ref[:] = _sample_taps(VB, T, R, Hl, Wl, bx, by)
    crossA_ref[:] = _sample_taps(VB, T, R, Hl, Wl, cAx_ref[:], cAy_ref[:])


def _pick_tile(BQ: int, R: int) -> int:
    """Largest dividing tile whose two volume tiles (bf16 in + f32 upcast)
    stay within a ~4 MB VMEM budget per grid step."""
    budget = 4 * 1024 * 1024
    for t in (32, 16, 8, 4, 2, 1):
        if BQ % t == 0 and 2 * t * R * LANES * 6 <= budget:
            return t
    return 1


def _pad_taps(c):
    """(BQ, NTAP) -> (BQ, LANES) f32 with zero padding."""
    return jnp.pad(c.astype(jnp.float32), ((0, 0), (0, LANES - NTAP)))


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
    B, Q, Hl, Wl = vol_A.shape
    BQ = B * Q
    R = max(1, -(-(Hl * Wl) // LANES))
    R2 = 1
    while R2 < R:
        R2 *= 2
    if Hl * Wl == R2 * LANES:
        # the common case (pow2 ERP extents): packing is a FREE reshape
        volA = vol_A.reshape(BQ, R2, LANES)
        volB = vol_B.reshape(BQ, R2, LANES)
    else:
        # ragged extents (odd padded images): zero-pad the flat volume to a
        # power-of-two number of lane rows (costs one HBM copy per level)
        pad = ((0, 0), (0, R2 * LANES - Hl * Wl))
        volA = jnp.pad(vol_A.reshape(BQ, Hl * Wl), pad).reshape(BQ, R2, LANES)
        volB = jnp.pad(vol_B.reshape(BQ, Hl * Wl), pad).reshape(BQ, R2, LANES)
    R = R2
    T = _pick_tile(BQ, R)
    cenA = cen_A.reshape(BQ, 2).astype(jnp.float32)
    cenB = cen_B.reshape(BQ, 2).astype(jnp.float32)
    cAx = _pad_taps(cross_A[..., 0].reshape(BQ, NTAP))
    cAy = _pad_taps(cross_A[..., 1].reshape(BQ, NTAP))
    cBx = _pad_taps(cross_B[..., 0].reshape(BQ, NTAP))
    cBy = _pad_taps(cross_B[..., 1].reshape(BQ, NTAP))

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
    )(cenA, cenB, cAx, cAy, cBx, cBy, volA, volB)

    return tuple(o[:, :NTAP].reshape(B, Q, NTAP) for o in outs)


# ---------------------------------------------------------------------------
# differentiable wrapper: gradients flow to the volumes only (lookup coords
# are stop_gradiented upstream each GRU iteration, core/prior_raft.py:171)
# ---------------------------------------------------------------------------

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def dccl_level_lookup(vol_A, vol_B, cen_A, cen_B, cross_A, cross_B,
                      level_scale: float = 1.0, interpret: bool = False):
    """Differentiable fused DCCL level lookup (see dccl_level_lookup_fused).

    Gradients propagate to ``vol_A``/``vol_B`` only; the coordinate inputs
    are treated as constants (they are stop_gradiented in the model step,
    mirroring the reference's per-iteration ``coords1.detach()``,
    core/prior_raft.py:171-177).
    """
    return dccl_level_lookup_fused(vol_A, vol_B, cen_A, cen_B,
                                   cross_A, cross_B, level_scale, interpret)


def _fwd(vol_A, vol_B, cen_A, cen_B, cross_A, cross_B, level_scale,
         interpret):
    out = dccl_level_lookup_fused(vol_A, vol_B, cen_A, cen_B,
                                  cross_A, cross_B, level_scale, interpret)
    # zero-size sentinels carry the static (Hl, Wl) extents and dtypes into
    # the backward pass (plain shapes/dtypes are not valid residual leaves)
    sentA = jnp.zeros((0,) + vol_A.shape[2:], vol_A.dtype)
    sentB = jnp.zeros((0,) + vol_B.shape[2:], vol_B.dtype)
    res = (cen_A, cen_B, cross_A, cross_B, sentA, sentB)
    return out, res


def _bwd(level_scale, interpret, res, cts):
    cen_A, cen_B, cross_A, cross_B, sentA, sentB = res
    g_ownA, g_crossA, g_ownB, g_crossB = cts
    dtA, dtB = sentA.dtype, sentB.dtype
    B, Q = cen_A.shape[:2]
    _, Hl, Wl = sentA.shape

    kk = jnp.arange(NTAP)
    ii = (kk // 9).astype(jnp.float32) - 4.0
    jj = (kk % 9).astype(jnp.float32) - 4.0
    ownAx = cen_A[..., 0:1] * level_scale + ii
    ownAy = cen_A[..., 1:2] * level_scale + jj
    ownBx = cen_B[..., 0:1] * level_scale + ii
    ownBy = cen_B[..., 1:2] * level_scale + jj

    # volume A receives branch A's own-window grads and branch B's cross
    d_volA = (_scatter_grads(g_ownA, ownAx, ownAy, Hl, Wl, dtA)
              + _scatter_grads(g_crossB, cross_B[..., 0], cross_B[..., 1],
                               Hl, Wl, dtA))
    d_volB = (_scatter_grads(g_ownB, ownBx, ownBy, Hl, Wl, dtB)
              + _scatter_grads(g_crossA, cross_A[..., 0], cross_A[..., 1],
                               Hl, Wl, dtB))
    return (d_volA, d_volB, None, None, None, None)


dccl_level_lookup.defvjp(_fwd, _bwd)
