"""Precomputed spherical-rotation grid bundles.

The PriOr-RAFT forward pass needs eight resampling grids per resolution
(A->B and B->A, each in camera->world and world->camera direction, at full
and 1/8 resolution). The reference rebuilds all of them on-device inside
*every* forward call (core/prior_raft.py:115-125); here they are pure
functions of (H, W) computed once on host, cached, and closed over as XLA
constants under ``jit``.

Rotation convention (core/prior_raft.py:115, 121):
  A->B uses Euler angles (z, y, x) = (0, 0, -pi/2);  B->A uses (0, 0, +pi/2).
Grid naming follows the reference:
  ``a2b``      : grid used to *produce* the B view from A (C2W direction),
  ``a2b_w2c``  : same rotation, transposed matrix (world->camera),
  suffix ``_8``: 1/8-resolution variant.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple

import numpy as np

from .rotation import make_sample_grid, rotation_matrix


class RotationGrids(NamedTuple):
    """All eight grids for one (H, W). Entries are float32 ``(h, w, 2)``."""

    a2b: np.ndarray
    a2b_8: np.ndarray
    a2b_w2c: np.ndarray
    a2b_w2c_8: np.ndarray
    b2a: np.ndarray
    b2a_8: np.ndarray
    b2a_w2c: np.ndarray
    b2a_w2c_8: np.ndarray


@lru_cache(maxsize=16)
def rotation_grids(H: int, W: int) -> RotationGrids:
    """Grid bundle for images of shape (H, W); 1/8 grids use (H//8, W//8)."""
    if H % 8 or W % 8:
        raise ValueError(f"(H, W) must be divisible by 8, got {(H, W)}")
    R_a2b = rotation_matrix([0.0, 0.0, -math.pi / 2])
    R_b2a = rotation_matrix([0.0, 0.0, math.pi / 2])
    h8, w8 = H // 8, W // 8
    return RotationGrids(
        a2b=make_sample_grid(H, W, R_a2b),
        a2b_8=make_sample_grid(h8, w8, R_a2b),
        a2b_w2c=make_sample_grid(H, W, R_a2b.T),
        a2b_w2c_8=make_sample_grid(h8, w8, R_a2b.T),
        b2a=make_sample_grid(H, W, R_b2a),
        b2a_8=make_sample_grid(h8, w8, R_b2a),
        b2a_w2c=make_sample_grid(H, W, R_b2a.T),
        b2a_w2c_8=make_sample_grid(h8, w8, R_b2a.T),
    )


@lru_cache(maxsize=32)
def sample_grid(H: int, W: int, euler_zyx: tuple, transpose: bool = False) -> np.ndarray:
    """Single cached rotation grid for arbitrary Euler angles (z, y, x)."""
    R = rotation_matrix(list(euler_zyx))
    return make_sample_grid(H, W, R.T if transpose else R)


@lru_cache(maxsize=32)
def identity_grid(H: int, W: int) -> np.ndarray:
    """Identity pixel-coordinate grid (H, W, 2), float32."""
    x, y = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    return np.stack([x, y], axis=-1)
