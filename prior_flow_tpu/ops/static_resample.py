"""Differentiable resampling at COMPILE-TIME-CONSTANT grids with a
gather-only backward pass.

Several hot resamples in the model run at static rotation grids (the DCCL
cross-result back-rotations, 8 per GRU iteration, and ``flo_rotate``'s
final camera->world resample — reference core/corr.py:137-139 and
core/utils/projection_prim_ortho.py:540-545). Autodiff of a gather is a
scatter-add, which XLA:TPU executes painfully slowly (serialised updates).
But when the grid is static the sampling operator is a fixed sparse matrix
whose TRANSPOSE can be precomputed on the host: each source cell knows, at
compile time, exactly which output cells read it and with what weights.
The backward pass then becomes another static GATHER (pad-to-max-degree
CSR), with zero scatters anywhere.

Two boundary semantics, matching ops.samplers exactly:

- ``mode='cycle_bilinear'`` — x wrapped mod W, zero padding outside the
  image, the x0+1==W corner contributes ZERO (the seam quirk of
  ``cycle_bilinear_sampler``, reference core/utils/utils.py:78-95);
- ``mode='cycle_grid'``     — true longitude wrap (x1 = (x0+1) % W),
  latitude clamp (``cycle_grid_sample``, is_grid=False payloads,
  reference core/utils/my_cycle_sample.py:6-79).

Plans are cached by (grid bytes, source extents, mode).
"""

from __future__ import annotations

import functools
import hashlib
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class _Plan:
    """Identity-hashed (it feeds custom_vjp's nondiff_argnums); instances
    are interned by the lru_cache below, so identity equality is correct.

    The transpose is DEGREE-BUCKETED: rotation grids compress whole regions
    into the pole rows, so per-source read degree is wildly skewed (mean 4,
    max ~174 at 1/8 res; 74% of cells have degree <= 4). Tier 1 is a
    (S, D0) padded-CSR gather covering every cell's first D0 entries; the
    overflow entries are split into compact per-degree-range buckets —
    (n_b, D_b) gathers placed back into the field by ANOTHER gather through
    a static inverse map. No scatter at any tier. The round-4 two-tier
    shape (D0=8 + one (544, 166) pad-to-max heavy tier at 1/8 res) moved
    ~1.4 GB/GRU-iteration for ~32k real weights (~24x padding waste in the
    heavy tier alone, train-step trace 2026-08-20); bucketing cuts that to
    the entries that exist.
    """

    __slots__ = ("grid", "mode", "bwd_idx", "bwd_w", "buckets",
                 "src_hw", "out_shape")

    def __init__(self, grid, mode, bwd_idx, bwd_w, buckets, src_hw,
                 out_shape):
        self.grid = grid            # (*out_shape, 2) float32 host grid
        self.mode = mode            # sampler semantics for the primal
        self.bwd_idx = bwd_idx      # (S, D0) int32 outputs reading a source
        self.bwd_w = bwd_w          # (S, D0) float32 matching weights
        # overflow buckets: list of (idx (n_b, D_b) int32, w (n_b, D_b)
        # float32, inv (S,) int32 -> row in the bucket result, n_b = zero
        # row) for successive degree ranges
        self.buckets = buckets
        self.src_hw = src_hw
        self.out_shape = out_shape


def _corners(grid: np.ndarray, H: int, W: int, mode: str):
    """4x (index, weight) corner lists for one grid under the given
    boundary semantics."""
    gx = grid[..., 0].reshape(-1).astype(np.float64)
    gy = grid[..., 1].reshape(-1).astype(np.float64)
    x = np.mod(gx, W)
    x0 = np.floor(x)
    y0 = np.floor(gy)
    fx = (x - x0).astype(np.float32)
    fy = (gy - y0).astype(np.float32)

    out_idx, out_w = [], []
    for dy in (0, 1):
        for dx in (0, 1):
            cx = x0 + dx
            cy = y0 + dy
            w = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
            if mode == "cycle_bilinear":
                valid = (cx <= W - 1) & (cy >= 0) & (cy <= H - 1)
                ix = np.clip(cx, 0, W - 1).astype(np.int64)
                iy = np.clip(cy, 0, H - 1).astype(np.int64)
                w = np.where(valid, w, 0.0)
            elif mode == "cycle_grid":
                ix = np.mod(cx, W).astype(np.int64)
                iy = np.clip(cy, 0, H - 1).astype(np.int64)
            else:
                raise ValueError(mode)
            out_idx.append((iy * W + ix).astype(np.int32))
            out_w.append(w.astype(np.float32))
    return np.stack(out_idx), np.stack(out_w)


D0 = 4  # tier-1 degree cap (74% of cells at 1/8 res have degree <= 4)
# overflow bucket caps: entries D0..8, 8..24, 24..max land in successive
# compact buckets (caps chosen against the measured degree histogram:
# <=8 covers 93.4% of cells, <=24 all but the pole-compression cells)
BUCKET_CAPS = (8, 24)


@functools.lru_cache(maxsize=64)
def _plan_cached(key, src_hw, out_shape, mode, grid_bytes):
    grid = np.frombuffer(grid_bytes, np.float32).reshape(out_shape + (2,))
    H, W = src_hw
    fwd_idx, fwd_w = _corners(grid, H, W, mode)
    N = fwd_idx.shape[1]
    S = H * W

    # transpose: CSR of (output, weight) per source cell; zero-weight
    # entries point at output 0
    flat_idx = fwd_idx.reshape(-1)
    flat_out = np.tile(np.arange(N, dtype=np.int32), 4)
    flat_w = fwd_w.reshape(-1)
    nz = flat_w != 0.0
    flat_idx, flat_out, flat_w = flat_idx[nz], flat_out[nz], flat_w[nz]
    order = np.argsort(flat_idx, kind="stable")
    flat_idx, flat_out, flat_w = (flat_idx[order], flat_out[order],
                                  flat_w[order])
    counts = np.bincount(flat_idx, minlength=S)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(flat_idx.size) - starts[flat_idx]

    d1 = int(min(counts.max(), D0)) if counts.size else 1
    t1 = pos < d1
    bwd_idx = np.zeros((S, max(d1, 1)), np.int32)
    bwd_w = np.zeros((S, max(d1, 1)), np.float32)
    bwd_idx[flat_idx[t1], pos[t1]] = flat_out[t1]
    bwd_w[flat_idx[t1], pos[t1]] = flat_w[t1]

    # overflow buckets: entries lo..hi of cells with degree > lo, compact
    # rows placed back through a static inverse map
    buckets = []
    max_deg = int(counts.max()) if counts.size else 0
    lo = d1
    caps = [c for c in BUCKET_CAPS if c > lo and c < max_deg] + [max_deg]
    for hi in caps:
        cells = np.nonzero(counts > lo)[0].astype(np.int32)
        n_b = cells.size
        if n_b == 0 or hi <= lo:
            break
        db = hi - lo
        cell_to_b = np.full(S, n_b, np.int32)
        cell_to_b[cells] = np.arange(n_b, dtype=np.int32)
        tb = (pos >= lo) & (pos < hi)
        b_idx = np.zeros((n_b, db), np.int32)
        b_w = np.zeros((n_b, db), np.float32)
        b_idx[cell_to_b[flat_idx[tb]], pos[tb] - lo] = flat_out[tb]
        b_w[cell_to_b[flat_idx[tb]], pos[tb] - lo] = flat_w[tb]
        buckets.append((b_idx, b_w, cell_to_b))
        lo = hi
    return _Plan(grid.astype(np.float32), mode, bwd_idx, bwd_w, buckets,
                 src_hw, out_shape)


def _get_plan(grid: np.ndarray, src_hw, mode) -> _Plan:
    grid = np.ascontiguousarray(np.asarray(grid, np.float32))
    key = hashlib.sha1(grid.tobytes()).hexdigest()
    return _plan_cached(key, tuple(src_hw), grid.shape[:-1], mode,
                        grid.tobytes())


def _rows(flat, idx_np):
    """Row gather: flat (B, R, C) at static indices (M,) -> (B, M, C).

    The operand is collapsed to 2-D (B*R, C) with per-batch row offsets
    baked into the static index constant, so XLA sees a plain row gather
    on a rank-2 buffer. Rationale: the pre-bucketing train-step trace
    (2026-08-20) showed layout assignment propagating the producer's
    batch-minormost layout into the 3-D ``take_along_axis`` form's
    operand (`f32[4,525825,24]{1,2,0}`), striding every C-contiguous row
    read across the whole array. Chip A/B AFTER degree bucketing: 2-D
    1849 ms/step vs 3-D 1843 — a null; the bucketed plans' smaller
    gathers no longer bind on layout. The 2-D form is kept as the
    layout-robust shape (docs/ARCHITECTURE.md §3 "Round-5 levers")."""
    B, R, C = flat.shape
    idx = idx_np.reshape(-1).astype(np.int64)
    full = np.arange(B, dtype=np.int64)[:, None] * R + idx[None, :]
    rows = jnp.take(flat.reshape(B * R, C),
                    jnp.asarray(full.reshape(-1), jnp.int32), axis=0)
    return rows.reshape(B, idx.size, C)


def _fwd_apply(plan: _Plan, img):
    """img: (B, H, W, C) -> (B, *out_shape, C).

    The primal runs through the ORIGINAL dynamic sampler (weights computed
    on device from the grid) — the precomputed-constant corner-gather
    formulation measured ~2.3 ms/GRU-iteration slower end to end on v5e.
    Only the BACKWARD uses the transpose plan.
    """
    from .samplers import cycle_bilinear_sample, cycle_grid_sample

    B = img.shape[0]
    grid = jnp.broadcast_to(jnp.asarray(plan.grid),
                            (B,) + plan.out_shape + (2,))
    # packed single-gather corners for small payloads (flow fields); for
    # wide payloads (e.g. the 324-channel DCCL back-rotations) the 4C
    # concat materialisation outweighs the saved gather rows
    packed = img.shape[-1] <= 16
    if plan.mode == "cycle_bilinear":
        return cycle_bilinear_sample(img, grid, packed=packed)
    return cycle_grid_sample(img, grid, packed=packed)


def _bwd_apply(plan: _Plan, ct):
    """ct: (B, *out_shape, C) -> (B, H, W, C) via the degree-bucketed
    transpose gather (see _Plan)."""
    B = ct.shape[0]
    C = ct.shape[-1]
    H, W = plan.src_hw
    flat = ct.reshape(B, -1, C)

    S, d1 = plan.bwd_idx.shape
    v = _rows(flat, plan.bwd_idx).reshape(B, S, d1, C)
    out = jnp.sum(v * jnp.asarray(plan.bwd_w)[None, :, :, None], axis=2)

    for b_idx, b_w, b_inv in plan.buckets:
        n_b, db = b_idx.shape
        bv = _rows(flat, b_idx).reshape(B, n_b, db, C)
        bsum = jnp.sum(bv * jnp.asarray(b_w)[None, :, :, None],
                       axis=2)                      # (B, n_b, C)
        bpad = jnp.concatenate(
            [bsum, jnp.zeros((B, 1, C), bsum.dtype)], axis=1)
        # placement is ITSELF a gather through the static inverse map
        out = out + _rows(bpad, b_inv)
    return out.reshape(B, H, W, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _resample(img, plan: _Plan):
    return _fwd_apply(plan, img)


def _resample_fwd(img, plan):
    # zero-size dtype carrier: residuals must be JAX types
    return _fwd_apply(plan, img), jnp.zeros((0,), img.dtype)


def _resample_bwd(plan, res, ct):
    return (_bwd_apply(plan, ct).astype(res.dtype),)


_resample.defvjp(_resample_fwd, _resample_bwd)


def is_static(grid) -> bool:
    """True when ``grid`` is a host constant (numpy or concrete jax.Array)
    whose values are known at trace time."""
    return not isinstance(grid, jax.core.Tracer)


def resample_static(img, grid, mode: str = "cycle_bilinear"):
    """Bilinearly resample ``img`` at the STATIC ``grid`` with a
    gather-only VJP.

    Numerically identical to ``cycle_bilinear_sample(img, grid)`` (or
    ``cycle_grid_sample`` for mode='cycle_grid') — asserted in
    tests/test_static_resample.py — but the backward pass is a precomputed
    transpose gather instead of an XLA scatter.

    img: (B, H, W, C); grid: (H2, W2, 2) host constant (a leading batch
    axis of size 1/B is accepted and collapsed — the grid must be
    batch-invariant, which rotation grids are).
    """
    g = np.asarray(grid, np.float32)
    if g.ndim == 4:
        if g.shape[0] > 1 and not np.all(g == g[:1]):
            raise ValueError(
                "resample_static requires a batch-invariant grid; got a "
                f"4-D grid of shape {g.shape} with per-sample differences "
                "— use cycle_bilinear_sample for per-sample grids")
        g = g[0]
    plan = _get_plan(g, (img.shape[1], img.shape[2]), mode)
    return _resample(img, plan)


def transpose_plan(grid, src_hw, mode: str = "cycle_bilinear") -> _Plan:
    """The transpose plan of ``resample_static(img, grid)`` as a hashable
    object (identity-hashed ``_Plan``), for callers that apply the LINEAR
    transpose of a static resample manually — e.g. the deferred DCCL
    volume-gradient rebind, whose custom VJP must back-rotate result-field
    cotangents recorded under ``stop_gradient`` (so autodiff never sees the
    forward resample). ``src_hw`` is the (H, W) of the resample's INPUT."""
    g = np.asarray(grid, np.float32)
    if g.ndim == 4:
        g = g[0]
    return _get_plan(g, tuple(src_hw), mode)


def apply_transpose(plan: _Plan, ct):
    """Apply a ``transpose_plan``: cotangent of the resample OUTPUT
    (B, *out_shape, C) -> cotangent of its input (B, H, W, C). Identical
    numerics to the resampler's own VJP (it IS ``_bwd_apply``)."""
    return _bwd_apply(plan, ct)
