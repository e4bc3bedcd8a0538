"""ERP (equirectangular projection) coordinate algebra.

Pure functions mapping between

- pixel-sample indices ``m`` (horizontal, [0, W)) / ``n`` (vertical, [0, H)),
- normalised coordinates ``u`` / ``v`` in (0, 1),
- spherical angles ``theta`` (longitude, [-pi, pi]) / ``phi``
  (latitude, (-pi/2, pi/2)).

Behavioural parity with the reference ``ERP`` static-method class
(PriOr-RAFT/core/utils/projection_prim_ortho.py:264-429), re-expressed as
plain jnp-compatible functions (they work on numpy or jax arrays alike).

Conventions used throughout this package:

- Coordinate grids are channels-last: ``(..., 2)`` with ``[..., 0] = x (m)``
  and ``[..., 1] = y (n)`` — matching the reference's dim-1=(m, n) layout.
- Pixel centres sit at half-integer normalised coordinates
  (``u = (m + 0.5) / W``), i.e. ``align_corners=False``-style sample points,
  while all bilinear *sampling* follows ``align_corners=True`` semantics
  (see ops.samplers).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

PI = math.pi


# ---------------------------------------------------------------------------
# scalar/array maps (reference projection_prim_ortho.py:264-395)
# ---------------------------------------------------------------------------

def n2v(n, H):
    """Vertical pixel index [0, H) -> normalised v in (0, 1)."""
    return (n + 0.5) / H


def v2n(v, H):
    """Normalised v (0, 1) -> vertical pixel index [0, H)."""
    return v * H - 0.5


def v2phi(v):
    """Normalised v (0, 1) -> latitude phi in (-pi/2, pi/2); v=0 is the north pole."""
    return (0.5 - v) * PI


def phi2v(phi):
    return 0.5 - phi / PI


def n2phi(n, H):
    return v2phi(n2v(n, H))


def phi2n(phi, H):
    return v2n(phi2v(phi), H)


def m2u(m, W):
    """Horizontal pixel index [0, W) -> normalised u in (0, 1)."""
    return (m + 0.5) / W


def u2m(u, W):
    return u * W - 0.5


def u2theta(u):
    """Normalised u (0, 1) -> longitude theta in [-pi, pi]."""
    return (u - 0.5) * 2.0 * PI


def theta2u(theta):
    return theta / (2.0 * PI) + 0.5


def m2theta(m, W):
    return u2theta(m2u(m, W))


def theta2m(theta, W):
    return u2m(theta2u(theta), W)


# ---------------------------------------------------------------------------
# grid maps (reference projection_prim_ortho.py:397-429)
# ---------------------------------------------------------------------------

def plane_to_spherical(grid, H, W):
    """Pixel grid ``(..., 2)`` [m, n] -> spherical grid ``(..., 2)`` [theta, phi].

    Reference: ``ERP.plane2spherical`` (projection_prim_ortho.py:397-411).
    """
    theta = m2theta(grid[..., 0], W)
    phi = n2phi(grid[..., 1], H)
    return jnp.stack([theta, phi], axis=-1)


def spherical_to_plane(sph, H, W, is_flow=False):
    """Spherical grid ``(..., 2)`` [theta, phi] -> pixel grid ``(..., 2)``.

    With ``is_flow=True`` the input is an *angular displacement*
    [d_theta, d_phi] and the output is a pixel displacement using the linear
    scaling ``d_m = d_theta * W / (2 pi)``, ``d_n = d_phi * H / (-pi)``.

    Reference: ``ERP.spherical2plane`` (projection_prim_ortho.py:413-429).
    """
    if not is_flow:
        m = theta2m(sph[..., 0], W)
        n = phi2n(sph[..., 1], H)
        return jnp.stack([m, n], axis=-1)
    dm = sph[..., 0] * W / (2.0 * PI)
    dn = sph[..., 1] * H / (-PI)
    return jnp.stack([dm, dn], axis=-1)


# ---------------------------------------------------------------------------
# flow helpers (reference projection_prim_ortho.py:200-244)
# ---------------------------------------------------------------------------

def u_clip(u, W):
    """Wrap horizontal flow periodically into [-W/2, W/2).

    Reference: ``u_clip`` (projection_prim_ortho.py:234-244).
    """
    return (u + W / 2.0) % W - W / 2.0


def piecewise_fun(x, bound):
    """Piecewise-linear [0, Bound) -> [-0.5, Bound - 0.5).

    Reference: ``PiecewiseFun`` (projection_prim_ortho.py:221-231).
    """
    return jnp.where(x >= bound - 0.5, x - bound, x)


def flow_to_endpoint(startpoint, flow, H, W):
    """Start coords + flow -> endpoint coords with horizontal wrap into
    [-0.5, W - 0.5) and vertical clamp to [-0.5, H - 0.5].

    ``startpoint``/``flow``: ``(..., 2)`` channels-last.
    Reference: ``flow2endpoint`` (projection_prim_ortho.py:200-218).
    """
    end = startpoint + flow
    ex = (end[..., 0] + 0.5) % W - 0.5
    ey = jnp.clip(end[..., 1], -0.5, H - 0.5)
    return jnp.stack([ex, ey], axis=-1)
