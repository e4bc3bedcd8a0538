"""Fused Pallas TPU kernel for the DCCL correlation lookup.

One pallas_call per pyramid level computes, for a tile of query pixels:

- the OWN-branch (2r+1)^2 window lookup around the query's current coords,
- the CROSS-branch lookup at the rotation-mapped per-tap coords,

entirely from VMEM-resident per-query volume slices. Both lookups are
expressed as one-hot bilinear contractions (see ops.corr._window_weights for
the semantics being reproduced: x wraps mod W, the x+1 corner at W is ZERO
— the reference's grid_sample seam quirk — and out-of-range y rows are
zero). Compared to the XLA 'mxu' path this keeps the (taps x Wl)
intermediates in VMEM instead of round-tripping ~0.5 GB/iteration through
HBM, and reads each level volume exactly once.

Use via ``DCCL(lookup_mode='pallas')``; falls back to interpret mode on CPU
for testing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 8  # queries per program


def _onehot_weights_1d(center, extent: int, offsets, wrap: bool, dtype):
    """(taps, extent) one-hot bilinear weights for one query.

    center: scalar f32; offsets: (taps, 1) f32 tap offsets.
    Semantics identical to ops.corr._window_weights.
    """
    t = center % extent if wrap else center
    t0 = jnp.floor(t)
    frac = (t - t0).astype(dtype)
    base = t0 + offsets  # (taps, 1)
    if wrap:
        base = base % extent
    cols = jax.lax.broadcasted_iota(jnp.int32, (offsets.shape[0], extent), 1).astype(jnp.float32)
    w = (jnp.where(cols == base, (1.0 - frac), 0.0) +
         jnp.where(cols == base + 1.0, frac, 0.0))
    return w.astype(dtype)


def _onehot_weights_percoord(coords, extent: int, wrap: bool, dtype):
    """(taps, extent) weights for per-tap independent coords (taps, 1)."""
    t = coords % extent if wrap else coords
    t0 = jnp.floor(t)
    frac = (t - t0).astype(dtype)
    cols = jax.lax.broadcasted_iota(jnp.int32, (coords.shape[0], extent), 1).astype(jnp.float32)
    w = (jnp.where(cols == t0, (1.0 - frac), 0.0) +
         jnp.where(cols == t0 + 1.0, frac, 0.0))
    return w.astype(dtype)


def _dccl_level_kernel(centers_ref, cross_ref, own_vol_ref, other_vol_ref,
                       own_out_ref, cross_out_ref, *, radius: int,
                       level_scale: float):
    n = 2 * radius + 1
    K = n * n
    dtype = own_vol_ref.dtype
    Hl = own_vol_ref.shape[1]
    Wl = own_vol_ref.shape[2]

    # tap offsets in the reference ordering k = i*n + j:
    # x offset i-r (i-major), y offset j-r (j-minor)  [core/corr.py:120-126]
    offs = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).astype(jnp.float32) - radius

    for t in range(TILE_Q):
        cx = centers_ref[t, 0] * level_scale
        cy = centers_ref[t, 1] * level_scale
        vol_own = own_vol_ref[t]      # (Hl, Wl)
        vol_other = other_vol_ref[t]  # (Hl, Wl)

        # ---- own-branch window lookup -----------------------------------
        wy = _onehot_weights_1d(cy, Hl, offs, wrap=False, dtype=dtype)  # (n,Hl)
        wx = _onehot_weights_1d(cx, Wl, offs, wrap=True, dtype=dtype)   # (n,Wl)
        tmp = jax.lax.dot_general(
            wy, vol_own, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (n=j, Wl)
        own = jax.lax.dot_general(
            tmp.astype(dtype), wx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (j, i)
        own_out_ref[t] = own.T.reshape(K)  # k = i*n + j

        # ---- cross-branch per-tap lookup --------------------------------
        cxk = cross_ref[t, :, 0:1]  # (K, 1)
        cyk = cross_ref[t, :, 1:2]
        wy2 = _onehot_weights_percoord(cyk, Hl, wrap=False, dtype=dtype)
        wx2 = _onehot_weights_percoord(cxk, Wl, wrap=True, dtype=dtype)
        tmp2 = jax.lax.dot_general(
            wy2, vol_other, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (K, Wl)
        cross = jnp.sum(tmp2 * wx2.astype(jnp.float32), axis=1)  # (K,)
        cross_out_ref[t] = cross


def dccl_level_lookup_pallas(own_vol, other_vol, centers, cross_coords,
                             radius: int = 4, level_scale: float = 1.0,
                             interpret: bool = False):
    """Fused own+cross lookup for one pyramid level.

    own_vol / other_vol: (B, Q, Hl, Wl);
    centers: (B, Q, 2) UNSCALED 1/8-res coords (scaled by ``level_scale``
    in-kernel for the own lookup, matching core/corr.py:123);
    cross_coords: (B, Q, K, 2) per-tap cross-view coords (already mapped).
    Returns (own, cross): each (B, Q, K) float32.
    """
    B, Q, Hl, Wl = own_vol.shape
    K = (2 * radius + 1) ** 2
    assert Q % TILE_Q == 0, f"Q={Q} must be a multiple of {TILE_Q}"
    grid = (B * Q // TILE_Q,)

    own_vol = own_vol.reshape(B * Q, Hl, Wl)
    other_vol = other_vol.reshape(B * Q, Hl, Wl)
    centers = centers.reshape(B * Q, 2)
    cross_coords = cross_coords.reshape(B * Q, K, 2)

    kernel = functools.partial(_dccl_level_kernel, radius=radius,
                               level_scale=level_scale)
    own, cross = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_Q, 2), lambda q: (q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Q, K, 2), lambda q: (q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Q, Hl, Wl), lambda q: (q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Q, Hl, Wl), lambda q: (q, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_Q, K), lambda q: (q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Q, K), lambda q: (q, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * Q, K), jnp.float32),
            jax.ShapeDtypeStruct((B * Q, K), jnp.float32),
        ),
        interpret=interpret,
    )(centers, cross_coords, own_vol, other_vol)
    return own.reshape(B, Q, K), cross.reshape(B, Q, K)
