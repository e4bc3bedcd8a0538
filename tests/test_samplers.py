"""Sampler parity tests.

``bilinear_sample`` / ``cycle_bilinear_sample`` are checked bit-for-bit-ish
against ``torch.nn.functional.grid_sample(align_corners=True,
padding_mode='zeros')`` — the exact op the reference wraps
(core/utils/utils.py:61-95). ``cycle_grid_sample`` is checked against a
naive numpy gather implementation of the reference's wrap/clamp semantics.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from prior_flow_tpu.ops import samplers


def torch_grid_sample(img_nhwc, coords, wrap_x=False, mode="bilinear"):
    """Reference semantics via torch: pixel coords -> normalised grid."""
    B, H, W, C = img_nhwc.shape
    img = torch.from_numpy(np.transpose(img_nhwc, (0, 3, 1, 2))).double()
    x = coords[..., 0].copy()
    y = coords[..., 1].copy()
    if wrap_x:
        x = x % W
    xg = 2 * x / (W - 1) - 1
    yg = 2 * y / (H - 1) - 1
    grid = torch.from_numpy(np.stack([xg, yg], -1)).double()
    if grid.ndim == 3:  # (B, Q, 2) -> (B, Q, 1, 2)
        grid = grid[:, :, None, :]
        out = F.grid_sample(img, grid, mode=mode, align_corners=True)
        return np.transpose(out.numpy()[..., 0], (0, 2, 1))
    out = F.grid_sample(img, grid, mode=mode, align_corners=True)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


@pytest.fixture
def img(rng):
    return rng.normal(size=(2, 16, 32, 3))


class TestBilinearSample:
    def test_matches_grid_sample_inbounds(self, rng, img):
        coords = np.stack([rng.uniform(0, 31, (2, 50)),
                           rng.uniform(0, 15, (2, 50))], -1)
        ours = np.asarray(samplers.bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
        ref = torch_grid_sample(img, coords)
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_matches_grid_sample_out_of_bounds(self, rng, img):
        coords = np.stack([rng.uniform(-10, 42, (2, 200)),
                           rng.uniform(-10, 26, (2, 200))], -1)
        ours = np.asarray(samplers.bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
        ref = torch_grid_sample(img, coords)
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_identity_coords(self, img):
        H, W = 16, 32
        gx, gy = np.meshgrid(np.arange(W, dtype=np.float64),
                             np.arange(H, dtype=np.float64))
        coords = np.broadcast_to(np.stack([gx, gy], -1), (2, H, W, 2))
        ours = np.asarray(samplers.bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
        np.testing.assert_allclose(ours, img, atol=2e-5)

    def test_mask_output(self, rng, img):
        coords = np.stack([rng.uniform(-5, 36, (2, 100)),
                           rng.uniform(-5, 20, (2, 100))], -1)
        _, mask = samplers.bilinear_sample(jnp.asarray(img), jnp.asarray(coords), mask=True)
        x, y = coords[..., 0], coords[..., 1]
        expected = ((x > 0) & (x < 31) & (y > 0) & (y < 15)).astype(np.float64)
        np.testing.assert_allclose(np.asarray(mask), expected)


class TestCycleBilinearSample:
    def test_matches_wrapped_grid_sample(self, rng, img):
        coords = np.stack([rng.uniform(-100, 100, (2, 300)),
                           rng.uniform(-4, 20, (2, 300))], -1)
        ours = np.asarray(samplers.cycle_bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
        ref = torch_grid_sample(img, coords, wrap_x=True)
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_seam_blends_with_zero_pad(self, img):
        """Parity quirk: x in (W-1, W) blends toward the zero pad, NOT col 0."""
        coords = np.array([[[31.5, 5.0]]] * 2)  # between last col and wrap
        ours = np.asarray(samplers.cycle_bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
        ref = torch_grid_sample(img, coords, wrap_x=True)
        np.testing.assert_allclose(ours, ref, atol=2e-5)
        # and it is NOT the true-wrap interpolation
        true_wrap = 0.5 * img[:, 5, 31] + 0.5 * img[:, 5, 0]
        assert not np.allclose(ours[:, 0], true_wrap)


def naive_cycle_grid_sample(img, grid, is_grid=False):
    """Direct numpy port of the reference gather semantics
    (core/utils/my_cycle_sample.py:6-97) for testing."""
    B, H, W, C = img.shape
    out = np.zeros(grid.shape[:-1] + (C,), dtype=np.float64)
    for b in range(B):
        g = grid[b].reshape(-1, 2).astype(np.float64)
        x = g[:, 0] % W
        y = g[:, 1]
        x0f, y0f = np.floor(x), np.floor(y)
        fx, fy = x - x0f, y - y0f
        x0 = (x0f.astype(int)) % W
        x1 = (x0f.astype(int) + 1) % W
        y0 = np.clip(y0f, 0, H - 1).astype(int)
        y1 = np.clip(y0f + 1, 0, H - 1).astype(int)
        Ia = img[b, y0, x0].astype(np.float64).copy()
        Ib = img[b, y1, x0].astype(np.float64).copy()
        Ic = img[b, y0, x1].astype(np.float64).copy()
        Id = img[b, y1, x1].astype(np.float64).copy()
        if is_grid:
            for I in (Ib, Ic, Id):
                I[:, 0] = Ia[:, 0] + ((I[:, 0] - Ia[:, 0]) + W / 2) % W - W / 2
        vals = ((1 - fx) * (1 - fy))[:, None] * Ia + ((1 - fx) * fy)[:, None] * Ib \
            + (fx * (1 - fy))[:, None] * Ic + (fx * fy)[:, None] * Id
        out[b] = vals.reshape(grid.shape[1:-1] + (C,))
    return out


class TestCycleGridSample:
    def test_matches_naive(self, rng, img):
        grid = np.stack([rng.uniform(-40, 80, (2, 7, 9)),
                         rng.uniform(-4, 20, (2, 7, 9))], -1)
        ours = np.asarray(samplers.cycle_grid_sample(jnp.asarray(img), jnp.asarray(grid)))
        ref = naive_cycle_grid_sample(img, grid)
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_true_wrap_at_seam(self, img):
        """Unlike cycle_bilinear_sample, the gather sampler truly wraps."""
        grid = np.array([[[31.5, 5.0]]] * 2)
        ours = np.asarray(samplers.cycle_grid_sample(jnp.asarray(img), jnp.asarray(grid)))
        true_wrap = 0.5 * img[:, 5, 31] + 0.5 * img[:, 5, 0]
        np.testing.assert_allclose(ours[:, 0], true_wrap, atol=2e-5)

    def test_is_grid_adjusts_coordinate_payload(self, rng):
        """Sampling a coordinate grid near the seam must not average across
        the +-W discontinuity."""
        H, W = 8, 16
        gx, gy = np.meshgrid(np.arange(W, dtype=np.float64),
                             np.arange(H, dtype=np.float64))
        coord_img = np.stack([gx, gy], -1)[None]  # payload = identity coords
        # query exactly between column W-1 (=15) and column 0
        q = np.array([[[15.5, 4.0]]])
        plain = np.asarray(samplers.cycle_grid_sample(
            jnp.asarray(coord_img), jnp.asarray(q), is_grid=False))
        fixed = np.asarray(samplers.cycle_grid_sample(
            jnp.asarray(coord_img), jnp.asarray(q), is_grid=True))
        # plain averages 15 and 0 -> 7.5 (wrong); fixed gives 15.5 (mod W)
        assert abs(plain[0, 0, 0] - 7.5) < 1e-6
        assert abs(fixed[0, 0, 0] % W - 15.5) < 1e-6
        ref = naive_cycle_grid_sample(coord_img, q, is_grid=True)
        np.testing.assert_allclose(fixed, ref, atol=2e-5)

    def test_matches_naive_is_grid(self, rng):
        H, W = 8, 16
        img = rng.normal(size=(1, H, W, 2)) * 20
        grid = np.stack([rng.uniform(-20, 40, (1, 5, 6)),
                         rng.uniform(-2, 10, (1, 5, 6))], -1)
        ours = np.asarray(samplers.cycle_grid_sample(
            jnp.asarray(img), jnp.asarray(grid), is_grid=True))
        ref = naive_cycle_grid_sample(img, grid, is_grid=True)
        np.testing.assert_allclose(ours, ref, atol=2e-5)


class TestMaskedVariants:
    def test_masked_bilinear_interpolate_zeroes_partial(self, rng, img):
        coords = np.stack([rng.uniform(-100, 100, (2, 11, 13)),
                           rng.uniform(-4, 20, (2, 11, 13))], -1)
        ours = np.asarray(samplers.masked_bilinear_interpolate(
            jnp.asarray(img), jnp.asarray(coords)))
        raw = torch_grid_sample(img, coords, wrap_x=True)
        ones = torch_grid_sample(np.ones_like(img), coords, wrap_x=True)
        mask = np.where(ones < 0.9999, 0.0, 1.0)
        np.testing.assert_allclose(ours, raw * mask, atol=2e-5)


class TestPackedCorners:
    """The packed single-gather corner path must be BIT-EXACT with the
    4-gather core for every boundary case (it is the production path of the
    full-res image rotation, ops/warp.py img_rotate)."""

    def test_bitexact_inbounds_and_out_of_range(self, rng, img):
        coords = np.stack([rng.uniform(-12, 44, (2, 400)),
                           rng.uniform(-12, 28, (2, 400))], -1)
        a = np.asarray(samplers.bilinear_sample(
            jnp.asarray(img), jnp.asarray(coords)))
        b = np.asarray(samplers.bilinear_sample(
            jnp.asarray(img), jnp.asarray(coords), packed=True))
        np.testing.assert_array_equal(a, b)

    def test_bitexact_cycle_wrap_and_seam(self, rng, img):
        H, W = img.shape[1], img.shape[2]
        # exercise the seam band (W-1, W) where x+1 blends with zero pad,
        # exact column hits, and the pole rows
        xs = np.concatenate([rng.uniform(-2 * W, 2 * W, (2, 200)),
                             np.full((2, 8), W - 1 + 0.25),
                             np.tile(np.arange(8.0), (2, 1))], axis=1)
        ys = np.concatenate([rng.uniform(-3, H + 3, (2, 200)),
                             rng.uniform(0, H - 1, (2, 8)),
                             np.full((2, 8), H - 1.0)], axis=1)
        coords = np.stack([xs, ys], -1)
        a = np.asarray(samplers.cycle_bilinear_sample(
            jnp.asarray(img), jnp.asarray(coords)))
        b = np.asarray(samplers.cycle_bilinear_sample(
            jnp.asarray(img), jnp.asarray(coords), packed=True))
        np.testing.assert_array_equal(a, b)

    def test_cycle_grid_packed_matches(self, rng, img):
        H, W = img.shape[1], img.shape[2]
        xs = np.concatenate([rng.uniform(-2 * W, 2 * W, (2, 300)),
                             np.full((2, 4), W - 0.25)], axis=1)
        ys = np.concatenate([rng.uniform(0, H - 1, (2, 150)),      # bulk
                             rng.uniform(H - 1, H + 3, (2, 75)),   # bottom
                             rng.uniform(-3, 0, (2, 75)),          # top
                             np.full((2, 4), H - 1.0)], axis=1)
        coords = np.stack([xs, ys], -1)
        for is_grid in (False, True):
            a = np.asarray(samplers.cycle_grid_sample(
                jnp.asarray(img), jnp.asarray(coords), is_grid=is_grid))
            b = np.asarray(samplers.cycle_grid_sample(
                jnp.asarray(img), jnp.asarray(coords), is_grid=is_grid,
                packed=True))
            # exact except the y<0 pole collapse, where the blend order
            # differs by one rounding (fy forced to 0 vs (1-fy)+fy sums)
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
        inrange = ys[:, :150]
        coords = np.stack([xs[:, :150], inrange], -1)
        a = np.asarray(samplers.cycle_grid_sample(
            jnp.asarray(img), jnp.asarray(coords)))
        b = np.asarray(samplers.cycle_grid_sample(
            jnp.asarray(img), jnp.asarray(coords), packed=True))
        np.testing.assert_array_equal(a, b)
