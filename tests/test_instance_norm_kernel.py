"""Pallas instance-norm kernel vs the plain jnp formula.

The production TPU path (nn/layers.py:57-63) routes every InstanceNorm
through ops/pallas/instance_norm.py; CPU test runs take the jnp branch, so
this file pins the kernel itself — forward AND the hand-derived custom VJP
— against the f32 reference formula in interpret mode, across both lane
layouts (slot-tiled C<128 and identity C>=128) and a multi-row-tile grid
that exercises the accumulate branch of _sums_kernel.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prior_flow_tpu.ops.pallas.instance_norm import instance_norm_fused

EPS = 1e-5


def _ref(x, eps=EPS):
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - m), axis=(1, 2), keepdims=True)
    return (xf - m) * jax.lax.rsqrt(var + eps)


@pytest.mark.parametrize("C", [64, 96, 128, 256])
def test_forward_matches_reference(C):
    rng = jax.random.PRNGKey(C)
    x = jax.random.normal(rng, (2, 8, 16, C), jnp.float32) * 3.0 + 1.5
    y = instance_norm_fused(x, EPS, None, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref(x)),
                               rtol=1e-5, atol=1e-5)


def test_forward_bf16_storage_f32_stats():
    """bf16 input: statistics and the normalisation affine stay f32, only
    the output rounds — so the kernel is strictly more accurate than bf16
    arithmetic and must agree with the f32 formula to bf16 rounding."""
    rng = jax.random.PRNGKey(7)
    x32 = jax.random.normal(rng, (2, 8, 16, 64), jnp.float32)
    x = x32.astype(jnp.bfloat16)
    y = instance_norm_fused(x, EPS, jnp.bfloat16, True)
    ref = _ref(x).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("C", [64, 96, 128])
def test_gradient_matches_autodiff_of_reference(C):
    rng = jax.random.PRNGKey(C + 1)
    x = jax.random.normal(rng, (2, 8, 16, C), jnp.float32) * 2.0 - 0.5
    w = jax.random.normal(jax.random.fold_in(rng, 1), x.shape[:3] + (C,))

    g_kernel = jax.grad(
        lambda t: jnp.sum(instance_norm_fused(t, EPS, None, True) * w))(x)
    g_ref = jax.grad(lambda t: jnp.sum(_ref(t) * w))(x)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_multi_tile_grid_accumulation():
    """H*W*C/128 > 2048 rows forces several row tiles per (batch, stat)
    block — the r != 0 accumulate branch must add, not overwrite."""
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (1, 64, 64, 128), jnp.float32)
    y = instance_norm_fused(x, EPS, None, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref(x)),
                               rtol=1e-5, atol=1e-5)
    g = jax.grad(
        lambda t: jnp.sum(instance_norm_fused(t, EPS, None, True) ** 2))(x)
    g_ref = jax.grad(lambda t: jnp.sum(_ref(t) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_bf16_gradient_dtype_and_value():
    rng = jax.random.PRNGKey(11)
    x = (jax.random.normal(rng, (1, 8, 16, 64), jnp.float32)
         ).astype(jnp.bfloat16)
    g = jax.grad(lambda t: jnp.sum(
        instance_norm_fused(t, EPS, jnp.bfloat16, True)
        .astype(jnp.float32) ** 2))(x)
    assert g.dtype == jnp.bfloat16
    g_ref = jax.grad(lambda t: jnp.sum(_ref(t) ** 2))(
        x.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(g, np.float32),
                               np.asarray(g_ref), rtol=5e-2, atol=5e-2)
