"""Utils tests: InputPadder, flow visualisation, warp helpers."""

import numpy as np

import jax.numpy as jnp

from prior_flow_tpu.ops import warp
from prior_flow_tpu.utils import flow_viz
from prior_flow_tpu.utils.padder import InputPadder


class TestInputPadder:
    def test_pad_unpad_roundtrip(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 30, 50, 3)).astype(np.float32))
        padder = InputPadder(x.shape)
        p = padder.pad(x)
        assert p.shape[1] % 8 == 0 and p.shape[2] % 8 == 0
        back = padder.unpad(p)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_already_divisible_is_identity(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 32, 64, 3)).astype(np.float32))
        padder = InputPadder(x.shape)
        assert padder.pad(x).shape == x.shape

    def test_kitti_mode_pads_bottom(self):
        padder = InputPadder((1, 30, 48, 3), mode="kitti")
        l, r, t, b = padder._pad
        assert t == 0 and b == 2


class TestWarp:
    def test_upflow8_shapes_and_scale(self, rng):
        f = jnp.asarray(rng.normal(size=(1, 8, 16, 2)).astype(np.float32))
        up = warp.upflow8(f)
        assert up.shape == (1, 64, 128, 2)
        # integer grid points carry 8x the original values (align_corners)
        np.testing.assert_allclose(np.asarray(up)[0, 0, 0],
                                   8 * np.asarray(f)[0, 0, 0], atol=1e-5)

    def test_downflow8_inverts_scale(self, rng):
        f = jnp.asarray(np.ones((1, 64, 128, 2), np.float32) * 8)
        down = warp.downflow8(f)
        assert down.shape == (1, 8, 16, 2)
        np.testing.assert_allclose(np.asarray(down), 1.0, atol=1e-5)

    def test_cycle_warp_zero_flow_identity(self, rng):
        img = jnp.asarray(rng.normal(size=(1, 16, 32, 3)).astype(np.float32))
        out = warp.cycle_warp(img, jnp.zeros((1, 16, 32, 2)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_img_a2b_b2a_roundtrip(self):
        """Rotating to the orthogonal view and back reproduces a SMOOTH
        image away from the poles (white noise does not survive double
        bilinear resampling, so the probe must be band-limited)."""
        gx, gy = np.meshgrid(np.linspace(0, 1, 128), np.linspace(0, 1, 64))
        smooth = np.stack([np.sin(4 * np.pi * gx), np.cos(3 * np.pi * gy),
                           gx * gy], -1).astype(np.float32)[None]
        back = warp.img_b2a(warp.img_a2b(jnp.asarray(smooth)))
        mid = np.s_[:, 24:40, 8:-8, :]  # equatorial band
        err = np.abs(np.asarray(back)[mid] - smooth[mid])
        assert np.median(err) < 0.005
        assert err.max() < 0.05

    def test_flo_a2b_zero_flow(self):
        out = warp.flo_a2b(jnp.zeros((1, 64, 128, 2)))
        assert float(jnp.abs(out).max()) < 1e-3


class TestFlowViz:
    def test_colorwheel(self):
        wheel = flow_viz.make_colorwheel()
        assert wheel.shape == (55, 3)
        assert wheel.min() >= 0 and wheel.max() <= 255

    def test_flow_to_image(self, rng):
        flow = rng.normal(size=(32, 64, 2)).astype(np.float32) * 5
        img = flow_viz.flow_to_image(flow)
        assert img.shape == (32, 64, 3) and img.dtype == np.uint8

    def test_omniflow_to_image_channels_first_and_last(self, rng):
        flow = rng.normal(size=(32, 64, 2)).astype(np.float32) * 5
        a = flow_viz.omniflow_to_image(flow)
        b = flow_viz.omniflow_to_image(np.transpose(flow, (2, 0, 1)))
        np.testing.assert_array_equal(a, b)
        assert a.shape == (32, 64, 3)

    def test_better_flow_to_image(self, rng):
        flow = rng.normal(size=(16, 32, 2)).astype(np.float32) * 100
        img = flow_viz.better_flow_to_image(flow)
        assert img.shape == (16, 32, 3)

    def test_save_gif(self, rng, tmp_path):
        img1 = rng.integers(0, 255, (64, 128, 3)).astype(np.uint8)
        img2 = rng.integers(0, 255, (64, 128, 3)).astype(np.uint8)
        flow = rng.normal(size=(64, 128, 2)).astype(np.float32) * 3
        out = flow_viz.save_gif(img1, img2, flow, "test", str(tmp_path))
        import os
        assert os.path.exists(out)
