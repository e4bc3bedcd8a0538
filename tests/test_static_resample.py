"""ops.static_resample: numerics == the dynamic samplers, VJP == autodiff,
and the backward graph contains no scatter ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prior_flow_tpu.geometry import grids as gridlib
from prior_flow_tpu.ops.samplers import (cycle_bilinear_sample,
                                         cycle_grid_sample)
from prior_flow_tpu.ops.static_resample import is_static, resample_static

H, W = 32, 64


@pytest.fixture
def rot_grid():
    return gridlib.rotation_grids(H * 8, W * 8).b2a_8  # (H, W, 2)


class TestForwardParity:
    def test_matches_cycle_bilinear(self, rot_grid, rng):
        img = jnp.asarray(rng.normal(size=(2, H, W, 5)).astype(np.float32))
        g = jnp.broadcast_to(jnp.asarray(rot_grid), (2, H, W, 2))
        ref = cycle_bilinear_sample(img, g)
        out = resample_static(img, rot_grid, mode="cycle_bilinear")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_matches_cycle_grid(self, rot_grid, rng):
        img = jnp.asarray(rng.normal(size=(1, H, W, 2)).astype(np.float32))
        g = jnp.broadcast_to(jnp.asarray(rot_grid), (1, H, W, 2))
        ref = cycle_grid_sample(img, g)
        out = resample_static(img, rot_grid, mode="cycle_grid")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_seam_and_pole_cases(self, rng):
        """Hand grid hitting the x-wrap seam and y borders in both modes."""
        g = np.array([[[W - 0.5, 1.2], [W - 1.0, -0.5],
                       [0.4, H - 1.0], [-3.3, H - 0.7]]], np.float32)
        img = jnp.asarray(rng.normal(size=(1, H, W, 3)).astype(np.float32))
        gb = jnp.broadcast_to(jnp.asarray(g), (1,) + g.shape[:-1] + (2,))
        for mode, fn in (("cycle_bilinear", cycle_bilinear_sample),
                         ("cycle_grid", cycle_grid_sample)):
            ref = fn(img, gb)
            out = resample_static(img, g, mode=mode)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-5, err_msg=mode)


class TestVJP:
    def test_gradient_matches_autodiff(self, rot_grid, rng):
        img = jnp.asarray(rng.normal(size=(2, H, W, 3)).astype(np.float32))
        g = jnp.broadcast_to(jnp.asarray(rot_grid), (2, H, W, 2))
        w = jnp.asarray(rng.normal(size=(2, H, W, 3)).astype(np.float32))

        ref_grad = jax.grad(
            lambda im: jnp.sum(w * cycle_bilinear_sample(im, g)))(img)
        our_grad = jax.grad(
            lambda im: jnp.sum(w * resample_static(im, rot_grid)))(img)
        np.testing.assert_allclose(np.asarray(our_grad), np.asarray(ref_grad),
                                   atol=1e-4)

    def test_gradient_matches_autodiff_cycle_grid(self, rot_grid, rng):
        img = jnp.asarray(rng.normal(size=(1, H, W, 2)).astype(np.float32))
        g = jnp.broadcast_to(jnp.asarray(rot_grid), (1, H, W, 2))
        w = jnp.asarray(rng.normal(size=(1, H, W, 2)).astype(np.float32))
        ref_grad = jax.grad(
            lambda im: jnp.sum(w * cycle_grid_sample(im, g)))(img)
        our_grad = jax.grad(lambda im: jnp.sum(
            w * resample_static(im, rot_grid, mode="cycle_grid")))(img)
        np.testing.assert_allclose(np.asarray(our_grad), np.asarray(ref_grad),
                                   atol=1e-4)

    def test_backward_has_no_scatter(self, rot_grid, rng):
        img = jnp.asarray(rng.normal(size=(1, H, W, 4)).astype(np.float32))
        hlo = jax.jit(jax.grad(lambda im: jnp.sum(
            resample_static(im, rot_grid) ** 2))).lower(img).as_text()
        assert "scatter" not in hlo, "transpose plan failed: scatter emitted"


class TestStaticness:
    def test_is_static(self, rot_grid):
        assert is_static(rot_grid)
        assert is_static(jnp.asarray(rot_grid))

        def f(x):
            assert not is_static(x)
            return x

        jax.jit(f)(jnp.zeros((2, 2)))
