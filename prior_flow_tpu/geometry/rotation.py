"""Spherical rotation math: Euler rotation matrices, Cartesian<->spherical
conversion, and ERP resampling-grid generation.

Behavioural parity with the reference
(PriOr-RAFT/core/utils/projection_prim_ortho.py:23-89, 247-261, 432-443),
but grids here are computed *once per (H, W, rotation)* in float64 numpy and
cached as constants (geometry.grids), instead of being rebuilt inside every
forward call on-device like the reference does (core/prior_raft.py:115-125).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from . import erp

_EPS = 1e-6


def rotation_matrix(theta_list, axis_list=("z", "y", "x"), dtype=np.float64):
    """Compose Euler rotations R = R_axis0(t0) @ R_axis1(t1) @ ...

    Matches ``generate_rotation_metrix`` (projection_prim_ortho.py:23-48):
    default axis order z, y, x, identity angles [0, 0, 0].
    Returns a numpy ``(3, 3)`` array (host-side constant).
    """
    R = np.eye(3, dtype=dtype)
    for axis, theta in zip(axis_list, theta_list):
        c, s = math.cos(theta), math.sin(theta)
        if axis == "x":
            M = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], dtype=dtype)
        elif axis == "y":
            M = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=dtype)
        elif axis == "z":
            M = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=dtype)
        else:
            raise ValueError(f"unknown axis {axis!r}")
        R = R @ M
    return R


def diverge_zero(x, eps=_EPS):
    """Push |x| < eps away from zero (sign-preserving); exact zeros stay zero.

    Reference: ``diverge_zero`` (projection_prim_ortho.py:69-74).
    """
    xp = np if isinstance(x, np.ndarray) else jnp
    near_zero = xp.abs(x) < eps
    return x + xp.sign(x) * near_zero * eps


def spherical_to_cartesian(sph):
    """``(..., 2)`` [theta, phi] -> ``(..., 3)`` [x, y, z] on the unit sphere.

    Reference: ``Spherical2Cartesian`` (projection_prim_ortho.py:77-89).
    """
    xp = np if isinstance(sph, np.ndarray) else jnp
    theta, phi = sph[..., 0], sph[..., 1]
    x = xp.cos(phi) * xp.cos(theta)
    y = xp.cos(phi) * xp.sin(theta)
    z = xp.sin(phi)
    return xp.stack([x, y, z], axis=-1)


def cartesian_to_spherical(cart):
    """``(..., 3)`` [x, y, z] -> ``(..., 2)`` [theta, phi].

    Uses the reference's ``diverge_zero`` guard inside atan2
    (``Cartesian2Spherical``, projection_prim_ortho.py:51-66).
    """
    xp = np if isinstance(cart, np.ndarray) else jnp
    x, y, z = cart[..., 0], cart[..., 1], cart[..., 2]
    phi = xp.arcsin(xp.clip(z, -1.0, 1.0))
    theta = xp.arctan2(diverge_zero(y), diverge_zero(x))
    return xp.stack([theta, phi], axis=-1)


def rotate_cartesian(cart, R):
    """Apply a ``(3, 3)`` rotation to a ``(..., 3)`` Cartesian grid.

    Reference: ``rotate_cartesian`` (projection_prim_ortho.py:247-261).
    """
    return cart @ np.asarray(R).T if isinstance(cart, np.ndarray) else cart @ jnp.asarray(R).T


def plane_grid(H, W, dtype=np.float64):
    """Identity pixel grid ``(H, W, 2)`` with [..., 0]=x, [..., 1]=y.

    Reference: ``generate_plane_grid`` (projection_prim_ortho.py:10-20),
    minus the batch dim (broadcast at use sites).
    """
    x = np.arange(W, dtype=dtype)
    y = np.arange(H, dtype=dtype)
    xx, yy = np.meshgrid(x, y)
    return np.stack([xx, yy], axis=-1)


def make_sample_grid_sized(H1, W1, H2, W2, R):
    """Rotation resampling grid between DIFFERENT ERP resolutions: output
    pixels of an (H1, W1) image map to source coordinates in an (H2, W2)
    image (reference ``generate_samplegrid_theta``,
    projection_prim_ortho.py:470-482)."""
    grid = plane_grid(H1, W1)
    theta = erp.m2theta(grid[..., 0], W1)
    phi = erp.n2phi(grid[..., 1], H1)
    sph = np.stack([theta, phi], axis=-1)
    cart_rot = rotate_cartesian(spherical_to_cartesian(sph), R)
    sph_rot = cartesian_to_spherical(cart_rot)
    m = erp.theta2m(sph_rot[..., 0], W2)
    n = erp.phi2n(sph_rot[..., 1], H2)
    return np.stack([m, n], axis=-1).astype(np.float32)


def make_sample_grid(H, W, R):
    """ERP resampling grid for a spherical rotation.

    For each output pixel (m, n): lift to the sphere, rotate by ``R``, map
    back to pixel coordinates. The returned ``(H, W, 2)`` float32 array holds,
    per output pixel, the *source* pixel coordinates to sample.

    Reference: ``generate_samplegrid`` (projection_prim_ortho.py:432-443).
    Computed in float64 then cast (the reference computes in float32 on-GPU).
    """
    grid = plane_grid(H, W)
    theta = erp.m2theta(grid[..., 0], W)
    phi = erp.n2phi(grid[..., 1], H)
    sph = np.stack([theta, phi], axis=-1)
    cart = spherical_to_cartesian(sph)
    cart_rot = rotate_cartesian(cart, R)
    sph_rot = cartesian_to_spherical(cart_rot)
    m = erp.theta2m(sph_rot[..., 0], W)
    n = erp.phi2n(sph_rot[..., 1], H)
    return np.stack([m, n], axis=-1).astype(np.float32)
