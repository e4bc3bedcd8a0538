"""Bilinear samplers — the correctness keystone of the whole framework.

The reference mixes THREE subtly different bilinear-sampling semantics, and
EPE parity lives or dies on reproducing each exactly:

1. ``bilinear_sample``        — ``F.grid_sample(align_corners=True)`` with
   zero padding outside the image, pixel-coordinate wrapper
   (reference core/utils/utils.py:61-75).
2. ``cycle_bilinear_sample``  — same, but x is first wrapped mod W
   (core/utils/utils.py:78-95 and the identical wrapper used by
   ``img_rotate``, core/utils/projection_prim_ortho.py:119-135). NOTE: after
   the wrap, positions in (W-1, W) still blend with the *zero pad* beyond the
   last column, NOT with column 0 — grid_sample's zero padding applies after
   normalisation. This seam behaviour is intentional parity.
3. ``cycle_grid_sample``      — the hand-rolled gather sampler with TRUE
   longitude wrap (x1 = (x0+1) % W) and latitude clamp, plus the
   ``adjust_sample_m`` fix-up when the sampled payload is itself a coordinate
   grid (core/utils/my_cycle_sample.py:6-97).

All images are channels-last ``(B, H, W, C)``; coordinate arrays are
``(B, ..., 2)`` with ``[..., 0] = x`` and ``[..., 1] = y`` in *pixel* units.
Outputs are ``(B, ..., C)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_2d(img, ix, iy):
    """Gather img[b, iy, ix, :] for integer index arrays of shape (B, Q)."""
    B, H, W, C = img.shape
    flat = img.reshape(B, H * W, C)
    idx = (iy * W + ix).astype(jnp.int32)
    return jnp.take_along_axis(flat, idx[..., None], axis=1)


def _bilinear_core(img, x, y):
    """align_corners=True bilinear with zero padding outside [0,W-1]x[0,H-1].

    x, y: (B, Q) float pixel coordinates. Returns (B, Q, C).
    """
    B, H, W, C = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    out = None
    for dy in (0, 1):
        for dx in (0, 1):
            cx = x0 + dx
            cy = y0 + dy
            wgt = (fx if dx else (1.0 - fx)) * (fy if dy else (1.0 - fy))
            valid = (cx >= 0) & (cx <= W - 1) & (cy >= 0) & (cy <= H - 1)
            ix = jnp.clip(cx, 0, W - 1).astype(jnp.int32)
            iy = jnp.clip(cy, 0, H - 1).astype(jnp.int32)
            val = _gather_2d(img, ix, iy)
            term = val * (wgt * valid)[..., None]
            out = term if out is None else out + term
    return out


def _bilinear_core_packed(img, x, y):
    """``_bilinear_core`` with all four corners fetched by ONE gather.

    The image is pre-shifted into a 4C-channel concat
    ``[img, x+1, y+1, x+1&y+1]`` (zero fill) so corner (dy, dx) of output
    q is channel block ``2*dy+dx`` of the single gather at the base index
    (y0, x0). Zero-fill shifts encode exactly the zero-padding semantics of
    grid_sample (and cycle_bilinear's seam quirk: the x0+1 corner at
    column W-1 reads the zero fill). Bit-exact with ``_bilinear_core``:
    same values, same weights, same summation order — asserted in
    tests/test_samplers.py. Motivation: XLA:TPU gather cost scales with
    gathered row count more than bytes; one 4C-row gather beats four
    C-row gathers for small C (the full-res image rotation,
    models/prior_raft.py forward, profiled 9.5 ms/forward at 512x1024x6ch).
    """
    B, H, W, C = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    # zero border of 1 on every side: base index (y0+1, x0+1) is in range
    # for all y0 in [-1, H] / x0 in [-1, W], and every shifted block reads
    # the true neighbour (or the zero pad) — no special-casing anywhere
    P = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    qx = jnp.concatenate([P[:, :, :-1, :], P[:, :, 1:, :]], axis=-1)
    quad = jnp.concatenate([qx[:, :-1, :, :], qx[:, 1:, :, :]], axis=-1)
    # quad: (B, H+1, W+1, 4C); channel block (2*dy+dx)*C at position
    # (q, p) holds P[q+dy, p+dx] = img[q-1+dy, p-1+dx]

    ix = jnp.clip(x0 + 1, 0, W).astype(jnp.int32)
    iy = jnp.clip(y0 + 1, 0, H).astype(jnp.int32)
    vals = _gather_2d(quad, ix, iy)                         # (B, Q, 4C)

    out = None
    for dy in (0, 1):
        for dx in (0, 1):
            cx = x0 + dx
            cy = y0 + dy
            wgt = (fx if dx else (1.0 - fx)) * (fy if dy else (1.0 - fy))
            valid = (cx >= 0) & (cx <= W - 1) & (cy >= 0) & (cy <= H - 1)
            blk = (2 * dy + dx) * C
            val = vals[..., blk:blk + C]
            term = val * (wgt * valid)[..., None]
            out = term if out is None else out + term
    return out


def _flatten_coords(coords):
    lead = coords.shape[:-1]
    return coords.reshape(lead[0], -1, 2), lead


def bilinear_sample(img, coords, mask=False, packed=False):
    """grid_sample(align_corners=True, padding_mode='zeros') in pixel coords.

    Reference: ``bilinear_sampler`` (core/utils/utils.py:61-75).
    With ``mask=True`` additionally returns the in-bounds mask computed the
    reference way (strict inequalities on the normalised grid).
    ``packed=True`` fetches all four corners with one gather (bit-exact,
    see _bilinear_core_packed) — faster on TPU for small channel counts.
    """
    H, W = img.shape[1], img.shape[2]
    flat, lead = _flatten_coords(coords)
    x, y = flat[..., 0], flat[..., 1]
    core = _bilinear_core_packed if packed else _bilinear_core
    out = core(img, x, y).reshape(*lead, img.shape[-1])
    if mask:
        xn = 2 * x / (W - 1) - 1
        yn = 2 * y / (H - 1) - 1
        m = ((xn > -1) & (xn < 1) & (yn > -1) & (yn < 1)).astype(img.dtype)
        return out, m.reshape(*lead)
    return out


def cycle_bilinear_sample(img, coords, mask=False, packed=False):
    """``bilinear_sample`` with x wrapped mod W first.

    Reference: ``cycle_bilinear_sampler`` (core/utils/utils.py:78-95).
    """
    W = img.shape[2]
    x = coords[..., 0] % W
    wrapped = jnp.stack([x, coords[..., 1]], axis=-1)
    return bilinear_sample(img, wrapped, mask=mask, packed=packed)


def cycle_grid_sample(img, grid, is_grid=False, packed=False):
    """Gather-based bilinear sample with true longitude wrap.

    - x is wrapped into [0, W); the x+1 corner wraps mod W (true seam wrap);
    - y corners are clamped to [0, H-1] (pole clamp);
    - when ``is_grid=True`` the payload is itself a coordinate grid: the m
      (x) channel of the b/c/d corners is re-expressed in the branch of the
      a corner before blending (``adjust_sample_m``,
      core/utils/my_cycle_sample.py:82-97) so interpolation never averages
      across the +-W discontinuity.

    Reference: ``cycle_grid_sample`` (core/utils/my_cycle_sample.py:6-79).
    img: (B, H, W, C); grid: (B, ..., 2) pixel coords. Returns (B, ..., C).
    """
    B, H, W, C = img.shape
    flat, lead = _flatten_coords(grid)
    x = flat[..., 0] % W
    y = flat[..., 1]

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f

    x0 = (x0f.astype(jnp.int32)) % W
    x1 = (x0f.astype(jnp.int32) + 1) % W
    y0 = jnp.clip(y0f, 0, H - 1).astype(jnp.int32)
    y1 = jnp.clip(y0f + 1, 0, H - 1).astype(jnp.int32)

    if packed:
        # one gather of a 4C-channel pre-shifted concat instead of four
        # C-channel gathers (see _bilinear_core_packed; faster on TPU for
        # small C). x+1 block: roll (true wrap); y+1 block: clamp (repeat
        # last row). Corner rows are then y0 and y0+1-clamped, which
        # matches (y0, y1) EXCEPT when y0f < 0 — there y0 == y1 == 0 and
        # the blend collapses to row 0, reproduced by forcing fy to 0.
        qx = jnp.concatenate([img, jnp.roll(img, -1, axis=2)], axis=-1)
        quad = jnp.concatenate(
            [qx, jnp.concatenate([qx[:, 1:], qx[:, -1:]], axis=1)], axis=-1)
        vals = _gather_2d(quad, x0, y0)                     # (B, Q, 4C)
        fy = jnp.where(y0f < 0, 0.0, fy)
        Ia = vals[..., 0 * C:1 * C]
        Ic = vals[..., 1 * C:2 * C]
        Ib = vals[..., 2 * C:3 * C]
        Id = vals[..., 3 * C:4 * C]
    else:
        Ia = _gather_2d(img, x0, y0)
        Ib = _gather_2d(img, x0, y1)
        Ic = _gather_2d(img, x1, y0)
        Id = _gather_2d(img, x1, y1)

    if is_grid:
        if C < 1:
            raise ValueError("is_grid=True requires a coordinate payload")
        half = W / 2.0

        def adjust(I):
            m = Ia[..., 0] + ((I[..., 0] - Ia[..., 0]) + half) % W - half
            return jnp.concatenate([m[..., None], I[..., 1:]], axis=-1)

        Ib, Ic, Id = adjust(Ib), adjust(Ic), adjust(Id)

    wa = ((1 - fx) * (1 - fy))[..., None]
    wb = ((1 - fx) * fy)[..., None]
    wc = (fx * (1 - fy))[..., None]
    wd = (fx * fy)[..., None]
    out = wa * Ia + wb * Ib + wc * Ic + wd * Id
    return out.reshape(*lead, C)


def masked_bilinear_interpolate(img, grid):
    """Wrap-x bilinear sample multiplied by a binarised validity mask.

    Reference: ``bilinear_interpolate``
    (core/utils/projection_prim_ortho.py:92-117): x wrapped mod W, then
    grid_sample(align_corners=True) of both the image and an all-ones mask;
    mask values < 0.9999 are zeroed, the rest set to 1.
    """
    W = img.shape[2]
    x = grid[..., 0] % W
    wrapped = jnp.stack([x, grid[..., 1]], axis=-1)
    out = bilinear_sample(img, wrapped)
    ones = jnp.ones_like(img)
    m = bilinear_sample(ones, wrapped)
    m = jnp.where(m < 0.9999, 0.0, 1.0)
    return out * m


def cycle_interpolate(img, grid, nearest=False):
    """Wrap-aware interpolation with an extra wrapped column.

    Reference: ``cycle_interpolate`` / ``cycle_interpolate_nearest``
    (core/utils/projection_prim_ortho.py:137-197): pads the image with a copy
    of column 0 on the right (width W+1), wraps x mod W, and normalises x by
    W (not W-1) so the seam interpolates into the wrapped column; the result
    is multiplied by a binarised resampled-ones mask.
    """
    B, H, W, C = img.shape
    padded = jnp.concatenate([img, img[:, :, :1, :]], axis=2)  # (B, H, W+1, C)
    x = grid[..., 0] % W
    y = grid[..., 1]
    # Reference normalises x by W over a (W+1)-wide image with
    # align_corners=True, i.e. effective pixel coordinate on the padded image
    # is x * W/(W) ... -> identical pixel coords on the padded image.
    coords = jnp.stack([x, y], axis=-1)
    if nearest:
        ix = jnp.round(coords[..., 0]).astype(jnp.int32)
        iy = jnp.round(coords[..., 1]).astype(jnp.int32)
        valid = (
            (ix >= 0) & (ix <= W) & (iy >= 0) & (iy <= H - 1)
        )
        ix = jnp.clip(ix, 0, W)
        iy = jnp.clip(iy, 0, H - 1)
        flat = padded.reshape(B, H * (W + 1), C)
        idx = (iy * (W + 1) + ix).astype(jnp.int32)
        lead = coords.shape[:-1]
        out = jnp.take_along_axis(
            flat, idx.reshape(B, -1)[..., None], axis=1
        ).reshape(*lead, C)
        return out * valid[..., None]
    out = bilinear_sample(padded, coords)
    ones = jnp.ones_like(padded)
    m = bilinear_sample(ones, coords)
    m = jnp.where(m < 0.9999, 0.0, 1.0)
    return out * m
