"""Image / flow / coordinate rotation warps and flow resizing.

TPU-native re-expression of the reference's rotation-warp layer
(PriOr-RAFT/core/utils/projection_prim_ortho.py:447-583 and
core/utils/my_cycle_sample.py:100-115). All tensors are channels-last:
images ``(B, H, W, C)``, flow fields ``(B, H, W, 2)``.

Rotation grids are passed in explicitly (precomputed via geometry.grids);
the convenience ``*_a2b`` / ``*_b2a`` wrappers fetch the cached ones.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry import erp, grids
from .samplers import bilinear_sample, cycle_bilinear_sample, cycle_grid_sample
from .static_resample import is_static, resample_static


def _bcast(grid, B):
    """(H, W, 2) host grid -> (B, H, W, 2) device constant."""
    g = jnp.asarray(grid)
    return jnp.broadcast_to(g, (B,) + g.shape)


def img_rotate(image, sample_grid):
    """Resample an image through a rotation grid.

    Reference: ``img_rotate`` (projection_prim_ortho.py:507-514) — uses the
    wrap-x grid_sample wrapper, NOT the gather sampler.
    image: (B, H, W, C); sample_grid: (H, W, 2) or (B, H, W, 2).
    """
    if sample_grid.ndim == 3:
        sample_grid = _bcast(sample_grid, image.shape[0])
    # packed single-gather corners (bit-exact) only pay off for narrow
    # payloads: the 4C-channel concat quadruples gather traffic, so wide
    # feature maps keep the 4-gather path (same heuristic as
    # static_resample's packed gate).
    packed = image.shape[-1] <= 16
    if packed and image.shape[0] > 1:
        # per-batch-element gathers: XLA layout assignment gives the
        # BATCHED gather a batch-minormost operand (f32[4,525825,24]
        # {1,2,0} in the train-step trace) that strides every row read
        # across the whole array; splitting the batch is bit-exact and
        # measured 3.8x faster (72.1 -> 19.2 ms, batch 4 at 512x1024 C=6,
        # tools/bench_img_rotate.py, 2026-08-20)
        return jnp.concatenate(
            [cycle_bilinear_sample(image[i:i + 1], sample_grid[i:i + 1],
                                   packed=True)
             for i in range(image.shape[0])], axis=0)
    return cycle_bilinear_sample(image, sample_grid, packed=packed)


def img_a2b(image):
    """A (primitive) view -> B (orthogonal) view. projection_prim_ortho.py:517-519."""
    H, W = image.shape[1], image.shape[2]
    return img_rotate(image, grids.rotation_grids(H, W).a2b if H % 8 == 0 and W % 8 == 0
                      else grids.sample_grid(H, W, (0.0, 0.0, -erp.PI / 2)))


def img_b2a(image):
    """B view -> A view. projection_prim_ortho.py:522-524."""
    H, W = image.shape[1], image.shape[2]
    return img_rotate(image, grids.rotation_grids(H, W).b2a if H % 8 == 0 and W % 8 == 0
                      else grids.sample_grid(H, W, (0.0, 0.0, erp.PI / 2)))


def flo_rotate(flow, sample_grid_w2c, sample_grid_c2w):
    """Rotate a *vector field* between ERP views.

    The endpoint-push/pull construction of the reference
    (``flo_rotate``, projection_prim_ortho.py:531-546):

    1. endpoints in the world frame = identity grid + flow (wrapped/clamped);
    2. push endpoints through the world->camera grid with the gather sampler
       in ``is_grid`` mode (coordinate payload, wrap-consistent corners);
    3. camera-frame flow = pushed endpoints - camera-frame start grid,
       horizontal component wrapped into [-W/2, W/2);
    4. resample the camera-frame flow at the camera->world grid.

    flow: (B, H, W, 2); grids: (H, W, 2) or (B, H, W, 2).
    """
    B, H, W, _ = flow.shape
    if sample_grid_w2c.ndim == 3:
        sample_grid_w2c = _bcast(sample_grid_w2c, B)
    if sample_grid_c2w.ndim == 3:
        sample_grid_c2w = _bcast(sample_grid_c2w, B)
    start_w = jnp.asarray(grids.identity_grid(H, W))[None]
    end_w = erp.flow_to_endpoint(start_w, flow, H, W)
    # packed corners: the w2c grid payload is a constant, so the 4C-channel
    # pre-shifted concat folds at compile time and the sample is ONE gather
    end_c = cycle_grid_sample(sample_grid_w2c, end_w, is_grid=True,
                              packed=True)
    flow_c = end_c - sample_grid_w2c
    flow_c = jnp.stack([erp.u_clip(flow_c[..., 0], W), flow_c[..., 1]], axis=-1)
    if is_static(sample_grid_c2w):
        # rotation grids are compile-time constants: the camera->world
        # resample runs with a precomputed transpose plan whose VJP is a
        # gather, not an XLA scatter (this op sits inside every GRU
        # iteration's backward, reference projection_prim_ortho.py:540-545)
        return resample_static(flow_c, sample_grid_c2w, mode="cycle_grid")
    return cycle_grid_sample(flow_c, sample_grid_c2w, is_grid=False)


def flo_a2b(flow):
    """A-frame flow -> B-frame flow (projection_prim_ortho.py:563-565)."""
    H, W = flow.shape[1], flow.shape[2]
    g = grids.rotation_grids(H, W)
    return flo_rotate(flow, g.a2b_w2c, g.a2b)


def flo_b2a(flow):
    """B-frame flow -> A-frame flow (projection_prim_ortho.py:568-570)."""
    H, W = flow.shape[1], flow.shape[2]
    g = grids.rotation_grids(H, W)
    return flo_rotate(flow, g.b2a_w2c, g.b2a)


def coord_rotate(coords, sample_grid_w2c, sample_grid_c2w):
    """Rotate an absolute coordinate field (projection_prim_ortho.py:548-561)."""
    B = coords.shape[0]
    if sample_grid_w2c.ndim == 3:
        sample_grid_w2c = _bcast(sample_grid_w2c, B)
    if sample_grid_c2w.ndim == 3:
        sample_grid_c2w = _bcast(sample_grid_c2w, B)
    end_c = cycle_grid_sample(sample_grid_w2c, coords, is_grid=True)
    return cycle_grid_sample(end_c, sample_grid_c2w, is_grid=True)


def cycle_warp(image, flow):
    """Backward-warp an image by a flow field with the true-wrap sampler.

    Reference: ``my_cycle_warp`` (core/utils/my_cycle_sample.py:100-115).
    """
    B, H, W, _ = image.shape
    grid = jnp.asarray(grids.identity_grid(H, W))[None] + flow
    return cycle_grid_sample(image, grid)


def img_rotate_theta(image, theta):
    """Rotate an ERP image by an arbitrary x-axis Euler angle
    (projection_prim_ortho.py:526-528)."""
    H, W = image.shape[1], image.shape[2]
    return img_rotate(image, grids.sample_grid(H, W, (0.0, 0.0, float(theta))))


def flo_rotate_theta(flow, theta):
    """Rotate an ERP flow field by an arbitrary x-axis Euler angle
    (projection_prim_ortho.py:580-582)."""
    H, W = flow.shape[1], flow.shape[2]
    g_w2c = grids.sample_grid(H, W, (0.0, 0.0, float(theta)), transpose=True)
    g_c2w = grids.sample_grid(H, W, (0.0, 0.0, float(theta)))
    return flo_rotate(flow, g_w2c, g_c2w)


def coord_a2b(coords):
    """Absolute coordinate field A -> B (projection_prim_ortho.py:572-574)."""
    H, W = coords.shape[1], coords.shape[2]
    g = grids.rotation_grids(H, W)
    return coord_rotate(coords, g.a2b_w2c, g.a2b)


def coord_b2a(coords):
    """Absolute coordinate field B -> A (projection_prim_ortho.py:576-578)."""
    H, W = coords.shape[1], coords.shape[2]
    g = grids.rotation_grids(H, W)
    return coord_rotate(coords, g.b2a_w2c, g.b2a)


def flow_to_camera(flow_world, R):
    """Re-express a world-frame ERP flow field in a rotated camera frame via
    per-pixel spherical angle differences (projection_prim_ortho.py:447-468).

    flow_world: (B, H, W, 2); R: (3, 3) rotation (numpy). Unlike
    ``flo_rotate`` this keeps the result on the WORLD pixel grid (the
    angular deltas are converted back to pixel deltas with the linear
    is_flow scaling and u-wrapped).
    """
    import numpy as np

    from ..geometry import rotation as rot

    B, H, W, _ = flow_world.shape
    start = jnp.asarray(grids.identity_grid(H, W))[None]
    end = erp.flow_to_endpoint(start, flow_world, H, W)
    Rt = np.asarray(R).T

    def to_cam(coords_px):
        sph = erp.plane_to_spherical(coords_px, H, W)
        cart = rot.spherical_to_cartesian(sph)
        cart_c = rot.rotate_cartesian(cart, Rt)
        return rot.cartesian_to_spherical(cart_c)

    d_sph = to_cam(end) - to_cam(start)
    d_px = erp.spherical_to_plane(d_sph, H, W, is_flow=True)
    return jnp.stack([erp.u_clip(d_px[..., 0], W), d_px[..., 1]], axis=-1)


def rotating_warping(src_feat, R, coords):
    """Warp per-candidate features through a spherical rotation
    (projection_prim_ortho.py:484-503): coords (B, N, H1, W1, 2) are lifted
    to the sphere, rotated by ``R``, mapped back to src pixel coords, and
    ``src_feat`` (B, H2, W2, C) is sampled with the masked wrap-x bilinear
    sampler. Returns (B, N, H1, W1, C)."""
    from ..geometry import rotation as rot
    from .samplers import masked_bilinear_interpolate

    B, H2, W2, C = src_feat.shape
    Bc, N, H1, W1, _ = coords.shape
    sph = erp.plane_to_spherical(coords, H1, W1)
    cart = rot.rotate_cartesian(rot.spherical_to_cartesian(sph), R)
    sph_r = rot.cartesian_to_spherical(cart)
    px = erp.spherical_to_plane(sph_r, H2, W2)
    out = masked_bilinear_interpolate(src_feat, px.reshape(B, N * H1, W1, 2))
    return out.reshape(B, N, H1, W1, C)


def legacy_warp(image, flow, cyclic=False):
    """Standalone backward warp with a binarised validity mask
    (core/utils/warp.py:5-98): grid = identity + flow, sampled with the
    plain (or wrap-x) grid_sample; a resampled all-ones mask <0.9999 is
    zeroed and multiplied in. Returns (warped, mask)."""
    B, H, W, _ = image.shape
    grid = jnp.asarray(grids.identity_grid(H, W))[None] + flow
    sampler = cycle_bilinear_sample if cyclic else bilinear_sample
    out = sampler(image, grid)
    mask = sampler(jnp.ones_like(image), grid)
    mask = jnp.where(mask < 0.9999, 0.0, 1.0)
    return out * mask, mask


def _resize_bilinear_align_corners(x, out_h, out_w):
    """Bilinear resize with align_corners=True (torch F.interpolate parity)."""
    B, H, W, C = x.shape
    ys = jnp.linspace(0.0, H - 1.0, out_h)
    xs = jnp.linspace(0.0, W - 1.0, out_w)
    gx, gy = jnp.meshgrid(xs, ys)
    coords = jnp.broadcast_to(jnp.stack([gx, gy], axis=-1), (B, out_h, out_w, 2))
    return bilinear_sample(x, coords)


def upflow8(flow):
    """8x bilinear upsample of a flow field with 8x magnitude scaling.

    Reference: ``upflow8`` (core/utils/utils.py:104-106).
    """
    B, H, W, _ = flow.shape
    return 8.0 * _resize_bilinear_align_corners(flow, 8 * H, 8 * W)


def downflow8(flow):
    """1/8 bilinear downsample with 1/8 magnitude scaling (utils.py:108-110)."""
    B, H, W, _ = flow.shape
    return _resize_bilinear_align_corners(flow, H // 8, W // 8) / 8.0
