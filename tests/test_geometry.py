"""Unit tests for the ERP/spherical geometry core against closed-form
identities (SURVEY.md §4 test plan, item 1)."""

import math

import numpy as np
import pytest

from prior_flow_tpu.geometry import erp, grids, rotation


class TestERPRoundTrips:
    def test_n_v_roundtrip(self):
        n = np.linspace(0, 511, 100)
        assert np.allclose(erp.v2n(erp.n2v(n, 512), 512), n)

    def test_m_u_roundtrip(self):
        m = np.linspace(0, 1023, 100)
        assert np.allclose(erp.u2m(erp.m2u(m, 1024), 1024), m)

    def test_phi_v_roundtrip(self):
        phi = np.linspace(-1.5, 1.5, 50)
        assert np.allclose(erp.v2phi(erp.phi2v(phi)), phi)

    def test_theta_u_roundtrip(self):
        theta = np.linspace(-3.1, 3.1, 50)
        assert np.allclose(erp.u2theta(erp.theta2u(theta)), theta)

    def test_plane_spherical_roundtrip(self):
        H, W = 64, 128
        g = rotation.plane_grid(H, W)
        sph = np.stack([erp.m2theta(g[..., 0], W), erp.n2phi(g[..., 1], H)], -1)
        m = erp.theta2m(sph[..., 0], W)
        n = erp.phi2n(sph[..., 1], H)
        assert np.allclose(m, g[..., 0], atol=1e-9)
        assert np.allclose(n, g[..., 1], atol=1e-9)

    def test_pixel_centers_map_to_angles(self):
        # pixel (W/2 - 0.5, H/2 - 0.5) is the image centre -> (theta, phi) = (0, 0)
        H, W = 512, 1024
        assert abs(erp.m2theta(W / 2 - 0.5, W)) < 1e-12
        assert abs(erp.n2phi(H / 2 - 0.5, H)) < 1e-12

    def test_u_clip_periodic(self):
        W = 128
        u = np.array([-200.0, -64.0, -63.9, 0.0, 63.9, 64.0, 200.0])
        c = erp.u_clip(u, W)
        assert np.all(c >= -W / 2) and np.all(c < W / 2)
        # clip is idempotent and preserves values already in range
        assert np.allclose(erp.u_clip(c, W), c)
        assert np.allclose(erp.u_clip(np.array([10.0]), W), [10.0])
        # wraps by exactly multiples of W (centre the residual to avoid
        # tiny-negative-float modulo artefacts)
        assert np.allclose((u - c + W / 2) % W - W / 2, 0.0)


class TestRotation:
    def test_rotation_matrix_orthonormal(self):
        R = rotation.rotation_matrix([0.3, -1.2, 0.7])
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.isclose(np.linalg.det(R), 1.0)

    def test_rotation_matrix_composition_order(self):
        # axis order z, y, x: R = Rz @ Ry @ Rx
        Rz = rotation.rotation_matrix([0.3, 0.0, 0.0])
        Ry = rotation.rotation_matrix([0.0, -0.5, 0.0])
        Rx = rotation.rotation_matrix([0.0, 0.0, 1.1])
        R = rotation.rotation_matrix([0.3, -0.5, 1.1])
        assert np.allclose(R, Rz @ Ry @ Rx, atol=1e-12)

    def test_cartesian_spherical_roundtrip(self):
        rng = np.random.default_rng(0)
        sph = np.stack(
            [rng.uniform(-math.pi + 0.01, math.pi - 0.01, 1000),
             rng.uniform(-math.pi / 2 + 0.01, math.pi / 2 - 0.01, 1000)], -1)
        cart = rotation.spherical_to_cartesian(sph)
        assert np.allclose(np.linalg.norm(cart, axis=-1), 1.0)
        back = rotation.cartesian_to_spherical(cart)
        assert np.allclose(back, sph, atol=1e-5)

    def test_identity_rotation_grid_is_identity(self):
        H, W = 64, 128
        g = rotation.make_sample_grid(H, W, np.eye(3))
        ident = grids.identity_grid(H, W)
        # x can wrap by W at theta = +-pi boundary; compare modulo W
        dx = (g[..., 0] - ident[..., 0] + W / 2) % W - W / 2
        assert np.abs(dx).max() < 1e-3
        assert np.abs(g[..., 1] - ident[..., 1]).max() < 1e-3

    def test_rotate_then_unrotate_grid(self):
        """grid(R) composed with grid(R^-1) ~ identity away from poles."""
        H, W = 64, 128
        R = rotation.rotation_matrix([0.0, 0.0, -math.pi / 2])
        g_fwd = rotation.make_sample_grid(H, W, R)

        # compose: lift output pixels of g_fwd through g_inv analytically
        sph = np.stack([erp.m2theta(g_fwd[..., 0], W),
                        erp.n2phi(g_fwd[..., 1], H)], -1)
        cart = rotation.spherical_to_cartesian(sph)
        cart2 = rotation.rotate_cartesian(cart, R.T)
        sph2 = rotation.cartesian_to_spherical(cart2)
        m = erp.theta2m(sph2[..., 0], W)
        n = erp.phi2n(sph2[..., 1], H)
        ident = grids.identity_grid(H, W)
        dx = (m - ident[..., 0] + W / 2) % W - W / 2
        assert np.abs(dx).max() < 1e-2
        assert np.abs(n - ident[..., 1]).max() < 1e-2

    def test_a2b_moves_pole_to_equator(self):
        """The orthogonal view places the poles on the equator: the source
        location sampled for the B-image centre row must come from near the
        A-image pole columns."""
        H, W = 64, 128
        g = grids.rotation_grids(H, W)
        # B-view pixel at equator, quarter-longitude: its source in A
        src = g.a2b[H // 2, :, :]  # (W, 2) source coords along B's equator
        # somewhere along B's equator the A-pole (y near 0 or H-1) must appear
        assert src[..., 1].min() < 2.0
        assert src[..., 1].max() > H - 3.0

    def test_rotation_grids_cached(self):
        a = grids.rotation_grids(64, 128)
        b = grids.rotation_grids(64, 128)
        assert a is b

    def test_flow_to_endpoint_wrap_and_clamp(self):
        H, W = 8, 16
        start = grids.identity_grid(H, W)[None]
        flow = np.zeros_like(start)
        flow[..., 0] = W  # full wrap
        end = np.asarray(erp.flow_to_endpoint(start, flow, H, W))
        dx = (end[..., 0] - start[..., 0] + W / 2) % W - W / 2
        assert np.abs(dx).max() < 1e-5
        flow2 = np.zeros_like(start)
        flow2[..., 1] = 100.0
        end2 = np.asarray(erp.flow_to_endpoint(start, flow2, H, W))
        assert end2[..., 1].max() <= H - 0.5

    def test_diverge_zero(self):
        x = np.array([0.0, 1e-8, -1e-8, 0.5])
        y = rotation.diverge_zero(x)
        assert y[0] == 0.0
        assert y[1] >= 1e-6 and y[2] <= -1e-6
        assert y[3] == 0.5
