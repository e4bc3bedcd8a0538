"""Measure the Y-locality of DCCL cross-tap scatter targets.

The patch-local volume-cotangent construction (docs/ARCHITECTURE.md §6,
round-5 lever) replaces the full-Hl one-hot H factor of the cross-tap
scatter einsum with a P-row patch. Its exactness rests on a geometric
claim: per (query, window-row j), the contributing corner rows of the 9
i-taps span < P rows. This script verifies that claim EXHAUSTIVELY against
the real rotation grids by sweeping window centres densely over (and
beyond) the image, replicating the kernel's sampling semantics bit-for-bit:

- window tap k = i*9+j carries x-offset i-4 / y-offset j-4 at the level
  scale (ops/corr.py::_window_delta, reference core/corr.py:120-126);
- the 1/8-res rotation grid is sampled at those coords with wrap-x /
  zero-pad-y bilinear semantics (reference core/corr.py:132-133) — for a
  window row straddling the grid's y-edge the sampled tap coords are
  PARTIAL values w*G[edge_row] in [0, G], and fully-outside rows give
  exactly 0;
- the resulting full-1/8-scale coords index the level volume (Hl, Wl)
  WITHOUT rescaling (the reference's level>0 quirk), corners clipped to
  [0, Hl-1] with out-of-range corners masked to zero weight
  (ops/pallas/dccl_gather.py::_one_hot_pair).

Output: per resolution / grid / level, the max contributing-corner row
span per (query, j) — the bound the patch size P must exceed — plus the
per-query (all 81 taps) span, which shows why a single per-query patch
cannot work near the grid's y-edges (three clusters: zero taps at row 0,
the partial band, the interior cluster).
"""

from __future__ import annotations

import argparse

import numpy as np

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prior_flow_tpu.geometry.grids import rotation_grids  # noqa: E402


def sample_grid_plane(G, xs, ys):
    """Bilinear sample of (Hg, Wg) plane at arbitrary coords with wrap-x /
    zero-pad-y (cycle_bilinear_sampler semantics, utils.py:78-95: x mod W
    first, then corner x0+1 == W contributes ZERO, not column 0)."""
    Hg, Wg = G.shape
    x = np.mod(xs, Wg)
    y = ys
    x0 = np.floor(x); y0 = np.floor(y)
    fx = x - x0; fy = y - y0
    out = np.zeros_like(x, dtype=np.float64)
    for cy, wy in ((y0, 1 - fy), (y0 + 1, fy)):
        my = (cy >= 0) & (cy <= Hg - 1)
        for cx, wx in ((x0, 1 - fx), (x0 + 1, fx)):
            mx = cx <= Wg - 1  # x already wrapped; x0+1 == Wg drops
            w = wy * wx * my * mx
            gi = G[np.clip(cy, 0, Hg - 1).astype(int),
                   np.clip(cx, 0, Wg - 1).astype(int)]
            out += w * gi
    return out


def corner_rows(tapy, Hl):
    """Contributing corner rows (no-wrap y semantics of _one_hot_pair):
    returns (rows0, rows1, valid0, valid1)."""
    y0 = np.floor(tapy)
    fy = tapy - y0
    v0 = (y0 >= 0) & (y0 <= Hl - 1) & ((1 - fy) > 0)
    v1 = (y0 + 1 >= 0) & (y0 + 1 <= Hl - 1) & (fy > 0)
    return y0, y0 + 1, v0, v1


def span_stats(grid_y, Hl, scale, step=0.25, margin=8.0):
    """Max contributing-corner row span per (centre, j), per centre, and
    per (centre, bucket) — the bound the patch einsum needs. Buckets follow
    the planned backward classification from the window row w_j = cy+(j-4)
    at GRID coords: interior (0 <= w_j <= Hg-1), partial (straddling the
    grid's y-edge by < 1 row), zero (fully outside -> tap value exactly 0,
    scatters to row 0). Chunked over centre rows to bound memory."""
    Hg, Wg = grid_y.shape
    cy_all = np.arange(-margin, Hg + margin + step, step, dtype=np.float64)
    cx = np.arange(0.0, Wg, step, dtype=np.float64)
    d = np.arange(-4.0, 5.0)
    big, small = np.float64(10 * Hl), np.float64(-10 * Hl)

    max_span_j = 0
    max_span_q = 0
    max_span_int = 0
    max_span_part = 0
    for c0 in range(0, cy_all.size, 8):
        cy = cy_all[c0:c0 + 8]
        CX, CY = np.meshgrid(cx, cy)          # (ncy, ncx)
        tx = np.broadcast_to(
            CX[..., None, None] + d[None, None, None, :],
            CX.shape + (9, 9))
        ty = np.broadcast_to(
            CY[..., None, None] + d[None, None, :, None],
            CY.shape + (9, 9))
        tapy = sample_grid_plane(grid_y, tx, ty)  # full-1/8-scale values

        r0, r1, v0, v1 = corner_rows(tapy, Hl)
        lo = np.minimum(np.where(v0, r0, big), np.where(v1, r1, big))
        hi = np.maximum(np.where(v0, r0, small), np.where(v1, r1, small))
        # bucket classification from the window row (per centre, j)
        wrow = CY[..., None] + (d - 0.0)[None, None, :]     # (ncy, ncx, j)
        interior = (wrow >= 0) & (wrow <= Hg - 1)
        zero = (wrow <= -1) | (wrow >= Hg)
        partial = ~interior & ~zero

        def bucket_span(mask_j):
            m = np.broadcast_to(mask_j[..., None], lo.shape)
            lo_b = np.where(m, lo, big).min(axis=(-2, -1))
            hi_b = np.where(m, hi, small).max(axis=(-2, -1))
            has = lo_b < big / 2
            return int(np.where(has, hi_b - lo_b + 1, 0).max())

        lo_j = lo.min(axis=-1); hi_j = hi.max(axis=-1)
        has_j = lo_j < big / 2
        max_span_j = max(max_span_j,
                         int(np.where(has_j, hi_j - lo_j + 1, 0).max()))
        lo_q = lo.min(axis=(-2, -1)); hi_q = hi.max(axis=(-2, -1))
        has_q = lo_q < big / 2
        max_span_q = max(max_span_q,
                         int(np.where(has_q, hi_q - lo_q + 1, 0).max()))
        max_span_int = max(max_span_int, bucket_span(interior))
        max_span_part = max(max_span_part, bucket_span(partial))
    return max_span_j, max_span_q, max_span_int, max_span_part


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="512x1024,256x512,1024x2048")
    ap.add_argument("--step", type=float, default=0.25)
    args = ap.parse_args()

    print(f"{'size':>10} {'grid':>8} {'level':>5} {'Hl':>4} "
          f"{'span/(q,j)':>10} {'span/q':>7} {'span/int':>9} {'span/part':>10}")
    worst_int, worst_part = 0, 0
    for size in args.sizes.split(","):
        H, W = (int(t) for t in size.split("x"))
        g = rotation_grids(H, W)
        for name, grid in (("a2b_w2c", g.a2b_w2c_8), ("b2a_w2c", g.b2a_w2c_8)):
            gy = grid[..., 1].astype(np.float64)
            for lvl in range(4):
                Hl = (H // 8) >> lvl
                sj, sq, si, sp = span_stats(gy, Hl, 1.0 / (1 << lvl),
                                            step=args.step)
                worst_int, worst_part = max(worst_int, si), max(worst_part, sp)
                print(f"{size:>10} {name:>8} {lvl:>5} {Hl:>4} "
                      f"{sj:>10} {sq:>7} {si:>9} {sp:>10}", flush=True)
    print(f"\nworst interior-bucket span: {worst_int} rows; worst "
          f"partial-bucket span: {worst_part} rows (patch sizes P_int/P_part "
          f"must be >= these)")


if __name__ == "__main__":
    main()
