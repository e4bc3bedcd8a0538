"""Spherical evaluation metrics: latitude weighting, great-circle (SEPE)
distance, and pole/equator region masks.

Rebuild of core/utils/spherical.py and core/utils/polemask.py as pure jnp
functions over channels-last flow fields (B, H, W, 2).
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..geometry import erp, grids
from ..ops.warp import img_rotate


@lru_cache(maxsize=16)
def spherical_mask(H: int, W: int) -> np.ndarray:
    """cos(latitude) weights normalised to sum 1 over the image (H, W).

    Reference: ``spherical_mask`` (core/utils/spherical.py:11-17).
    """
    n = np.arange(H, dtype=np.float64)[:, None]
    phi = erp.n2phi(n, H)
    mask = np.broadcast_to(np.cos(phi), (H, W))
    return (mask / mask.sum()).astype(np.float32)


def _haversine(x):
    return jnp.square(jnp.sin(x / 2.0))


def _haversine_inverse(y):
    return 2.0 * jnp.arcsin(jnp.sqrt(jnp.clip(y, 0.0, 1.0)))


def _endpoint_spherical(flow, H, W):
    start = jnp.asarray(grids.identity_grid(H, W))[None]
    end = erp.flow_to_endpoint(start, flow, H, W)
    theta = erp.m2theta(end[..., 0], W)
    phi = erp.n2phi(end[..., 1], H)
    return theta, phi


def great_circle_distance(pred_flow, gt_flow, method: str = "Haversine",
                          R: float = 1.0):
    """SEPE: great-circle distance between predicted and GT flow endpoints
    on the unit sphere (core/utils/spherical.py:20-53).

    pred_flow, gt_flow: (B, H, W, 2) -> (B, H, W) distances.
    """
    assert method in ("Haversine", "Cosine")
    B, H, W, _ = pred_flow.shape
    th_p, ph_p = _endpoint_spherical(pred_flow, H, W)
    th_g, ph_g = _endpoint_spherical(gt_flow, H, W)
    if method == "Cosine":
        cos_a = (jnp.sin(ph_p) * jnp.sin(ph_g) +
                 jnp.cos(ph_p) * jnp.cos(ph_g) * jnp.cos(th_g - th_p))
        alpha = jnp.arccos(jnp.clip(cos_a, -1.0, 1.0))
    else:
        hav = (_haversine(ph_g - ph_p) +
               jnp.cos(ph_p) * jnp.cos(ph_g) * _haversine(th_g - th_p))
        alpha = _haversine_inverse(hav)
    return alpha * R


def spherical_flow_magnitude(flow, R: float = 1.0):
    """Great-circle arc length of each flow vector (visualisation magnitude).

    Reference: ``calculate_veclen_spherical`` (core/utils/spherical.py:56-70).
    """
    B, H, W, _ = flow.shape
    start = jnp.asarray(grids.identity_grid(H, W))[None]
    th_s = erp.m2theta(start[..., 0], W)
    ph_s = erp.n2phi(start[..., 1], H)
    th_e, ph_e = _endpoint_spherical(flow, H, W)
    hav = (_haversine(ph_e - ph_s) +
           jnp.cos(ph_s) * jnp.cos(ph_e) * _haversine(th_e - th_s))
    return R * _haversine_inverse(hav)


def epe(pred_flow, gt_flow):
    """Euclidean endpoint error per pixel: (B, H, W)."""
    return jnp.sqrt(jnp.sum((pred_flow - gt_flow) ** 2, axis=-1))


@lru_cache(maxsize=8)
def generate_polemask(H: int, W: int, delta_phi: float = math.pi / 2):
    """(pole_mask_A, pole_mask_B) each (H, W) int arrays.

    The A mask marks latitudes beyond +-delta_phi/2 (poles); the B mask is
    the A mask rotated into the orthogonal view and re-binarised.
    Reference: ``generate_polemask`` (core/utils/polemask.py:7-26).
    """
    max_phi = delta_phi / 2
    min_n = int(round(erp.phi2n(max_phi, H)))
    max_n = int(round(erp.phi2n(-max_phi, H)))
    center_A = np.zeros((H, W), np.float32)
    center_A[min_n:max_n, :] = 1
    pole_A = 1.0 - center_A

    g = grids.rotation_grids(H, W) if (H % 8 == 0 and W % 8 == 0) else None
    a2b = g.a2b if g is not None else grids.sample_grid(H, W, (0.0, 0.0, -math.pi / 2))
    pole_B = np.asarray(img_rotate(jnp.asarray(pole_A)[None, :, :, None],
                                   jnp.asarray(a2b)))[0, :, :, 0]
    pole_B = np.where(pole_B < 0.5, 0.0, 1.0)
    return pole_A.astype(np.int64), pole_B.astype(np.int64)


@lru_cache(maxsize=8)
def generate_polemask_d(H: int, W: int, delta_phi: float = math.pi / 2):
    """(pole_mask_A, pole_mask_D): D-view variant via a y-axis rotation.

    Reference: ``generate_polemaskD`` (core/utils/polemask.py:29-49).
    """
    max_phi = delta_phi / 2
    min_n = int(round(erp.phi2n(max_phi, H)))
    max_n = int(round(erp.phi2n(-max_phi, H)))
    center_A = np.zeros((H, W), np.float32)
    center_A[min_n:max_n, :] = 1
    pole_A = 1.0 - center_A

    gD = grids.sample_grid(H, W, (0.0, -math.pi / 2, 0.0))
    pole_D = np.asarray(img_rotate(jnp.asarray(pole_A)[None, :, :, None],
                                   jnp.asarray(gD)))[0, :, :, 0]
    pole_D = np.where(pole_D < 0.5, 0.0, 1.0)
    return pole_A.astype(np.int64), pole_D.astype(np.int64)


def region_masks(H: int, W: int):
    """Named region masks {All, Equator, Poles, Center} as bool (H, W).

    Matches the reference evaluators' construction (evaluate.py:253-262):
    Poles = |phi| > 45°, Equator = complement, Center = pole mask of the
    B view.
    """
    pole_A, pole_B = generate_polemask(H, W)
    return {
        "All": np.ones((H, W), bool),
        "Equator": (1 - pole_A).astype(bool),
        "Poles": pole_A.astype(bool),
        "Center": pole_B.astype(bool),
    }
