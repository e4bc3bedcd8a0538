"""Correlation volume / pyramid / DCCL / groupwise-corr unit tests against
naive numpy implementations (SURVEY.md §4 plan, item 2)."""

import numpy as np
import pytest
import jax.numpy as jnp

from prior_flow_tpu.ops import corr as C
from prior_flow_tpu.ops.samplers import cycle_bilinear_sample


class TestAllPairs:
    def test_matches_naive(self, rng):
        B, H, W, ch = 2, 4, 6, 8
        f1 = rng.normal(size=(B, H, W, ch)).astype(np.float32)
        f2 = rng.normal(size=(B, H, W, ch)).astype(np.float32)
        vol = np.asarray(C.all_pairs_correlation(jnp.asarray(f1), jnp.asarray(f2)))
        naive = np.einsum("bxc,byc->bxy", f1.reshape(B, -1, ch),
                          f2.reshape(B, -1, ch)) / np.sqrt(ch)
        np.testing.assert_allclose(vol.reshape(B, H * W, H * W),
                                   naive, atol=1e-5)

    def test_scale_factor(self, rng):
        f = np.ones((1, 2, 2, 16), np.float32)
        vol = np.asarray(C.all_pairs_correlation(jnp.asarray(f), jnp.asarray(f)))
        np.testing.assert_allclose(vol, 16 / 4.0)


class TestPyramid:
    def test_avg_pool(self, rng):
        x = rng.normal(size=(1, 3, 8, 12)).astype(np.float32)
        p = np.asarray(C.avg_pool2(jnp.asarray(x)))
        expected = x.reshape(1, 3, 4, 2, 6, 2).mean(axis=(3, 5))
        np.testing.assert_allclose(p, expected, atol=1e-6)

    def test_levels(self, rng):
        vol = jnp.asarray(rng.normal(size=(1, 5, 16, 32)).astype(np.float32))
        pyr = C.build_pyramid(vol, num_levels=4)
        assert [p.shape for p in pyr] == [
            (1, 5, 16, 32), (1, 5, 8, 16), (1, 5, 4, 8), (1, 5, 2, 4)]


class TestLeanPyramid:
    def test_matches_dense_build_bitexact(self, rng):
        """Chunked large-resolution build (ops/corr.py::build_pyramid_lean)
        must equal dense build_pyramid(all_pairs(...)) cast per level —
        pooling is per-query, so query chunking commutes with it."""
        import jax
        B, h, w, ch = 2, 8, 16, 32
        f1 = jnp.asarray(rng.normal(size=(B, h, w, ch)).astype(np.float32))
        f2 = jnp.asarray(rng.normal(size=(B, h, w, ch)).astype(np.float32))
        with jax.default_matmul_precision("highest"):
            dense = [p.astype(jnp.bfloat16) for p in C.build_pyramid(
                C.all_pairs_correlation(f1, f2), 4)]
            lean = C.build_pyramid_lean(f1, f2, 4, jnp.bfloat16, q_chunk=32)
        assert len(lean) == 4
        for d, l in zip(dense, lean):
            assert l.dtype == jnp.bfloat16
            np.testing.assert_array_equal(np.asarray(d), np.asarray(l))


class TestWindowDelta:
    def test_reference_tap_ordering(self):
        """Tap k = i*(2r+1)+j must carry x-offset i-r and y-offset j-r
        (reference meshgrid(dy, dx) quirk, core/corr.py:120-126)."""
        d = C._window_delta(4)
        assert d.shape == (81, 2)
        for k in range(81):
            i, j = divmod(k, 9)
            assert d[k, 0] == i - 4  # x offset
            assert d[k, 1] == j - 4  # y offset


class TestSampleVolumeLevel:
    def test_matches_flat_sampler(self, rng):
        B, Q, Hl, Wl, K = 2, 5, 8, 16, 7
        vol = rng.normal(size=(B, Q, Hl, Wl)).astype(np.float32)
        coords = np.stack([rng.uniform(-4, 20, (B, Q, K)),
                           rng.uniform(-2, 10, (B, Q, K))], -1).astype(np.float32)
        out = np.asarray(C.sample_volume_level(jnp.asarray(vol), jnp.asarray(coords)))
        ref = np.asarray(cycle_bilinear_sample(
            jnp.asarray(vol.reshape(B * Q, Hl, Wl, 1)),
            jnp.asarray(coords.reshape(B * Q, K, 2)))).reshape(B, Q, K)
        np.testing.assert_allclose(out, ref, atol=1e-6)


class TestGroupwiseCorr:
    def test_matches_naive(self, rng):
        B, H, W, ch, G = 2, 4, 6, 16, 4
        f1 = rng.normal(size=(B, H, W, ch)).astype(np.float32)
        f2 = rng.normal(size=(B, H, W, ch)).astype(np.float32)
        out = np.asarray(C.groupwise_corr(jnp.asarray(f1), jnp.asarray(f2), G))
        naive = (f1 * f2).reshape(B, H, W, G, ch // G).mean(-1)
        np.testing.assert_allclose(out, naive, atol=1e-6)


class TestDCCL:
    def test_identity_coords_own_lookup_center_tap(self, rng):
        """With identity coords the centre tap of the level-0 own lookup is
        the diagonal of the cost volume."""
        B, h, w = 1, 8, 16
        Q = h * w
        vol = rng.normal(size=(B, Q, h, w)).astype(np.float32)
        pyr = C.build_pyramid(jnp.asarray(vol), 4)
        gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32))
        coords = np.stack([gx, gy], -1)[None]
        ident = np.zeros((h, w, 2), np.float32)
        ident[..., 0] = gx
        ident[..., 1] = gy
        grid = jnp.asarray(ident)  # identity rotation grid stand-in
        dccl = C.DCCL(num_levels=4, radius=4)
        own, cross = dccl(jnp.asarray(coords), pyr, pyr, grid, grid)
        assert own.shape == (B, h, w, 4 * 81)
        # centre tap index = 4*9+4 = 40 at level 0
        center = np.asarray(own)[0, :, :, 40]
        diag = vol[0, np.arange(Q), :, :].reshape(Q, h * w)[np.arange(Q),
                                                            np.arange(Q)]
        np.testing.assert_allclose(center, diag.reshape(h, w), atol=1e-5)

    def test_output_is_finite_and_shaped(self, rng):
        B, h, w = 2, 8, 16
        Q = h * w
        volA = rng.normal(size=(B, Q, h, w)).astype(np.float32)
        volB = rng.normal(size=(B, Q, h, w)).astype(np.float32)
        pyrA = C.build_pyramid(jnp.asarray(volA), 4)
        pyrB = C.build_pyramid(jnp.asarray(volB), 4)
        from prior_flow_tpu.geometry import grids
        g = grids.rotation_grids(h * 8, w * 8)
        coords = jnp.asarray(
            grids.identity_grid(h, w)[None] +
            rng.normal(size=(B, h, w, 2)).astype(np.float32) * 3)
        dccl = C.DCCL()
        own, cross = dccl(coords, pyrA, pyrB,
                          jnp.asarray(g.a2b_w2c_8), jnp.asarray(g.b2a_8))
        assert own.shape == cross.shape == (B, h, w, 324)
        assert np.isfinite(np.asarray(own)).all()
        assert np.isfinite(np.asarray(cross)).all()


class TestMXULookupParity:
    def test_mxu_equals_gather(self, rng):
        """The MXU (one-hot matmul) DCCL path must match the gather path."""
        import jax
        from prior_flow_tpu.geometry import grids
        B, h, w = 2, 8, 16
        Q = h * w
        volA = rng.normal(size=(B, Q, h, w)).astype(np.float32)
        volB = rng.normal(size=(B, Q, h, w)).astype(np.float32)
        pyrA = C.build_pyramid(jnp.asarray(volA), 4)
        pyrB = C.build_pyramid(jnp.asarray(volB), 4)
        g = grids.rotation_grids(h * 8, w * 8)
        coords = jnp.asarray(grids.identity_grid(h, w)[None] +
                             rng.normal(size=(B, h, w, 2)).astype(np.float32) * 5)
        with jax.default_matmul_precision("highest"):
            o1, c1 = C.DCCL(lookup_mode="gather")(
                coords, pyrA, pyrB, jnp.asarray(g.a2b_w2c_8), jnp.asarray(g.b2a_8))
            o2, c2 = C.DCCL(lookup_mode="mxu")(
                coords, pyrA, pyrB, jnp.asarray(g.a2b_w2c_8), jnp.asarray(g.b2a_8))
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=5e-5)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=5e-5)

    @pytest.mark.slow  # interpret-mode Pallas on CPU: tens of seconds
    def test_pallas_fused_equals_two_mxu_calls(self, rng):
        """DCCLFused (gather kernel, interpret mode on CPU) must match the
        two-call mxu DCCL for BOTH branches."""
        import jax
        from prior_flow_tpu.geometry import grids
        B, h, w = 1, 8, 16
        Q = h * w
        volA = rng.normal(size=(B, Q, h, w)).astype(np.float32)
        volB = rng.normal(size=(B, Q, h, w)).astype(np.float32)
        pyrA = C.build_pyramid(jnp.asarray(volA), 4)
        pyrB = C.build_pyramid(jnp.asarray(volB), 4)
        g = grids.rotation_grids(h * 8, w * 8)
        base = grids.identity_grid(h, w)[None]
        coordsA = jnp.asarray(base + rng.normal(size=(B, h, w, 2)) * 5
                              ).astype(jnp.float32)
        coordsB = jnp.asarray(base + rng.normal(size=(B, h, w, 2)) * 5
                              ).astype(jnp.float32)
        a2bw, b2aw = jnp.asarray(g.a2b_w2c_8), jnp.asarray(g.b2a_w2c_8)
        a2b8, b2a8 = jnp.asarray(g.a2b_8), jnp.asarray(g.b2a_8)
        with jax.default_matmul_precision("highest"):
            oA, cA = C.DCCL(lookup_mode="mxu")(coordsA, pyrA, pyrB, a2bw, b2a8)
            oB, cB = C.DCCL(lookup_mode="mxu")(coordsB, pyrB, pyrA, b2aw, a2b8)
            for grid_in_kernel in (False, True):
                fA, fcA, fB, fcB = C.DCCLFused(
                    grid_in_kernel=grid_in_kernel)(
                        coordsA, coordsB, pyrA, pyrB, a2bw, b2aw, a2b8, b2a8)
                np.testing.assert_allclose(np.asarray(fA), np.asarray(oA),
                                           atol=5e-5)
                np.testing.assert_allclose(np.asarray(fcA), np.asarray(cA),
                                           atol=5e-5)
                np.testing.assert_allclose(np.asarray(fB), np.asarray(oB),
                                           atol=5e-5)
                np.testing.assert_allclose(np.asarray(fcB), np.asarray(cB),
                                           atol=5e-5)

    @pytest.mark.slow  # interpret-mode Pallas VJP on CPU
    def test_pallas_grid_kernel_vjp_matches_autodiff(self, rng):
        """Volume gradients through DCCLFused with the in-kernel grid-window
        sampling (the production training path: grid_in_kernel default) must
        match autodiff through the mxu DCCL, chaining through the pyramid
        pooling. Pins _packed_grid_bwd and its kernel-emitted residual
        coords."""
        import jax
        from prior_flow_tpu.geometry import grids
        B, h, w = 1, 8, 16
        Q = h * w
        volA = jnp.asarray(rng.normal(size=(B, Q, h, w)).astype(np.float32))
        volB = jnp.asarray(rng.normal(size=(B, Q, h, w)).astype(np.float32))
        g = grids.rotation_grids(h * 8, w * 8)
        base = grids.identity_grid(h, w)[None]
        coordsA = jnp.asarray(base + rng.normal(size=(B, h, w, 2)) * 5
                              ).astype(jnp.float32)
        coordsB = jnp.asarray(base + rng.normal(size=(B, h, w, 2)) * 5
                              ).astype(jnp.float32)
        a2bw, b2aw = jnp.asarray(g.a2b_w2c_8), jnp.asarray(g.b2a_w2c_8)
        a2b8, b2a8 = jnp.asarray(g.a2b_8), jnp.asarray(g.b2a_8)
        weights = (1.0, 2.0, 3.0, 4.0)

        def loss_fused(vA, vB):
            pyrA = C.build_pyramid(vA, 4)
            pyrB = C.build_pyramid(vB, 4)
            outs = C.DCCLFused(grid_in_kernel=True)(
                coordsA, coordsB, pyrA, pyrB, a2bw, b2aw, a2b8, b2a8)
            return sum((o * wt).sum() for o, wt in zip(outs, weights))

        def loss_ref(vA, vB):
            pyrA = C.build_pyramid(vA, 4)
            pyrB = C.build_pyramid(vB, 4)
            oA, cA = C.DCCL(lookup_mode="mxu")(coordsA, pyrA, pyrB,
                                               a2bw, b2a8)
            oB, cB = C.DCCL(lookup_mode="mxu")(coordsB, pyrB, pyrA,
                                               b2aw, a2b8)
            return sum((o * wt).sum()
                       for o, wt in zip((oA, cA, oB, cB), weights))

        import jax as _jax
        with _jax.default_matmul_precision("highest"):
            gA, gB = jax.grad(loss_fused, argnums=(0, 1))(volA, volB)
            rA, rB = jax.grad(loss_ref, argnums=(0, 1))(volA, volB)
        np.testing.assert_allclose(np.asarray(gA), np.asarray(rA), atol=2e-4)
        np.testing.assert_allclose(np.asarray(gB), np.asarray(rB), atol=2e-4)

    @pytest.mark.slow  # interpret-mode Pallas VJP on CPU
    def test_pallas_fused_vjp_matches_autodiff(self, rng):
        """The custom VJP of the fused kernel (volume grads) must match
        autodiff through the differentiable mxu formulation."""
        import jax
        from prior_flow_tpu.ops.pallas.dccl_gather import dccl_level_lookup
        B, Q, Hl, Wl = 1, 16, 8, 16
        volA = jnp.asarray(rng.normal(size=(B, Q, Hl, Wl)).astype(np.float32))
        volB = jnp.asarray(rng.normal(size=(B, Q, Hl, Wl)).astype(np.float32))
        cenA = jnp.asarray(np.stack([rng.uniform(-2, Wl + 2, (B, Q)),
                                     rng.uniform(-2, Hl + 2, (B, Q))],
                                    -1).astype(np.float32))
        cenB = jnp.asarray(np.stack([rng.uniform(-2, Wl + 2, (B, Q)),
                                     rng.uniform(-2, Hl + 2, (B, Q))],
                                    -1).astype(np.float32))
        crA = jnp.asarray(np.stack([rng.uniform(-2, Wl + 2, (B, Q, 81)),
                                    rng.uniform(-2, Hl + 2, (B, Q, 81))],
                                   -1).astype(np.float32))
        crB = jnp.asarray(np.stack([rng.uniform(-2, Wl + 2, (B, Q, 81)),
                                    rng.uniform(-2, Hl + 2, (B, Q, 81))],
                                   -1).astype(np.float32))

        def loss_fused(vA, vB):
            outs = dccl_level_lookup(vA, vB, cenA, cenB, crA, crB, 1.0, True)
            return sum((o * (i + 1)).sum() for i, o in enumerate(outs))

        def loss_ref(vA, vB):
            oA = C.lookup_window_mxu(vA, cenA, 4).reshape(B, Q, 81)
            oB = C.lookup_window_mxu(vB, cenB, 4).reshape(B, Q, 81)
            cA = C.sample_volume_level_mxu(vB, crA)
            cB = C.sample_volume_level_mxu(vA, crB)
            return (oA * 1).sum() + (cA * 2).sum() + (oB * 3).sum() + \
                (cB * 4).sum()

        with jax.default_matmul_precision("highest"):
            gA, gB = jax.grad(loss_fused, argnums=(0, 1))(volA, volB)
            rA, rB = jax.grad(loss_ref, argnums=(0, 1))(volA, volB)
        np.testing.assert_allclose(np.asarray(gA), np.asarray(rA), atol=2e-4)
        np.testing.assert_allclose(np.asarray(gB), np.asarray(rB), atol=2e-4)

    def test_sample_volume_level_mxu(self, rng):
        import jax
        B, Q, Hl, Wl, K = 2, 5, 8, 16, 13
        vol = rng.normal(size=(B, Q, Hl, Wl)).astype(np.float32)
        coords = np.stack([rng.uniform(-4, 20, (B, Q, K)),
                           rng.uniform(-2, 10, (B, Q, K))], -1).astype(np.float32)
        with jax.default_matmul_precision("highest"):
            a = np.asarray(C.sample_volume_level(jnp.asarray(vol), jnp.asarray(coords)))
            b = np.asarray(C.sample_volume_level_mxu(jnp.asarray(vol), jnp.asarray(coords), tap_chunk=5))
        np.testing.assert_allclose(a, b, atol=5e-5)


@pytest.mark.slow  # interpret-mode Pallas all-levels kernel on CPU
class TestFusedLevels:
    """The all-levels single-launch kernel (DCCLFused(fuse_levels=True),
    ops/pallas/dccl_gather.py::_dccl_grid_kernel_all) must match the
    per-level kernel path exactly — forward and volume cotangents."""

    def _setup(self, rng):
        from prior_flow_tpu.geometry import grids
        B, h, w = 1, 8, 16
        Q = h * w
        volA = jnp.asarray(rng.normal(size=(B, Q, h, w)).astype(np.float32))
        volB = jnp.asarray(rng.normal(size=(B, Q, h, w)).astype(np.float32))
        g = grids.rotation_grids(h * 8, w * 8)
        base = grids.identity_grid(h, w)[None]
        coordsA = jnp.asarray(base + rng.normal(size=(B, h, w, 2)) * 5
                              ).astype(jnp.float32)
        coordsB = jnp.asarray(base + rng.normal(size=(B, h, w, 2)) * 5
                              ).astype(jnp.float32)
        gs = (jnp.asarray(g.a2b_w2c_8), jnp.asarray(g.b2a_w2c_8),
              jnp.asarray(g.a2b_8), jnp.asarray(g.b2a_8))
        return volA, volB, coordsA, coordsB, gs

    def test_forward_equals_per_level(self, rng):
        volA, volB, coordsA, coordsB, gs = self._setup(rng)
        pyrA = C.build_pyramid(volA, 4)
        pyrB = C.build_pyramid(volB, 4)
        ref = C.DCCLFused(grid_in_kernel=True, fuse_levels=False)(
            coordsA, coordsB, pyrA, pyrB, *gs)
        got = C.DCCLFused(grid_in_kernel=True, fuse_levels=True)(
            coordsA, coordsB, pyrA, pyrB, *gs)
        for a, b in zip(ref, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_vjp_equals_per_level(self, rng):
        import jax
        volA, volB, coordsA, coordsB, gs = self._setup(rng)
        weights = (1.0, 2.0, 3.0, 4.0)

        def loss(vA, vB, fuse):
            pyrA = C.build_pyramid(vA, 4)
            pyrB = C.build_pyramid(vB, 4)
            outs = C.DCCLFused(grid_in_kernel=True, fuse_levels=fuse)(
                coordsA, coordsB, pyrA, pyrB, *gs)
            return sum((o * wt).sum() for o, wt in zip(outs, weights))

        import jax as _jax
        with _jax.default_matmul_precision("highest"):
            gA, gB = jax.grad(lambda a, b: loss(a, b, True),
                              argnums=(0, 1))(volA, volB)
            rA, rB = jax.grad(lambda a, b: loss(a, b, False),
                              argnums=(0, 1))(volA, volB)
        np.testing.assert_allclose(np.asarray(gA), np.asarray(rA), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gB), np.asarray(rB), atol=1e-5)


class TestPatchScatter:
    """Patch-local volume-cotangent construction (round-5 lever): the
    cross-tap / own-window scatter einsums with the one-hot H factor shrunk
    to a per-query P-row patch must equal the dense forms EXACTLY whenever
    the contributing corner rows fit the patch — which
    tools/measure_cross_span.py proves they always do for the real rotation
    grids (worst per-query span 40 rows < P=48 at 512x1024 level 0).

    The patch path ships default-OFF (the round-5 chip A/B measured it at
    3374 vs 1843 ms/step — dccl_gather.py CROSS_PATCH_ROWS note), so these
    tests pin the opt-in P=48 explicitly."""

    OPT_IN_P = 48

    def _real_tap_coords(self, Q, Hg=64, Wg=128, seed=0, edge_frac=0.5):
        """Cross-view tap coords for Q random window centres through the
        REAL a2b grid, replicating the kernel's sampling semantics
        (wrap-x with the x0+1==W zero quirk, zero-pad y) — including the
        adversarial edge/seam centres that produce partially-scaled taps."""
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), ".."))
        from tools.measure_cross_span import sample_grid_plane
        from prior_flow_tpu.geometry.grids import rotation_grids

        g = rotation_grids(Hg * 8, Wg * 8)
        gx = np.asarray(g.a2b_w2c_8[..., 0], np.float64)
        gy = np.asarray(g.a2b_w2c_8[..., 1], np.float64)
        rng = np.random.default_rng(seed)
        n_edge = int(Q * edge_frac)
        cy = np.concatenate([
            rng.uniform(-6, 6, n_edge // 2),            # top edge band
            rng.uniform(Hg - 6, Hg + 6, n_edge - n_edge // 2),  # bottom
            rng.uniform(0, Hg - 1, Q - n_edge)])
        cx = rng.uniform(-1, Wg + 1, Q)  # includes the x seam
        d = np.arange(-4.0, 5.0)
        tx = cx[:, None, None] + d[None, None, :]   # k = i*9+j: i is x
        ty = cy[:, None, None] + d[None, :, None]
        tx = np.broadcast_to(tx, (Q, 9, 9))
        ty = np.broadcast_to(ty, (Q, 9, 9))
        tapx = sample_grid_plane(gx, tx, ty).transpose(0, 2, 1).reshape(Q, 81)
        tapy = sample_grid_plane(gy, tx, ty).transpose(0, 2, 1).reshape(Q, 81)
        cen = np.stack([cx, cy], axis=-1)
        return (tapx[None].astype(np.float32), tapy[None].astype(np.float32),
                cen[None].astype(np.float32))

    def test_cross_patch_equals_dense_real_geometry(self):
        from prior_flow_tpu.ops.pallas.dccl_gather import (
            _place_patches, _scatter_grads, _scatter_grads_patch)

        Hl, Wl = 64, 128
        tapx, tapy, _ = self._real_tap_coords(Q=192)
        rng = np.random.default_rng(1)
        g = jnp.asarray(rng.normal(size=tapx.shape).astype(np.float32))
        dense = _scatter_grads(g, jnp.asarray(tapx), jnp.asarray(tapy),
                               Hl, Wl, jnp.float32)
        patch, base = _scatter_grads_patch(
            g, jnp.asarray(tapx), jnp.asarray(tapy), Hl, Wl, jnp.float32,
            self.OPT_IN_P)
        placed = _place_patches(Hl, (patch, base))
        np.testing.assert_allclose(np.asarray(placed), np.asarray(dense),
                                   atol=1e-5, rtol=1e-5)
        # the patch path must carry real mass (the fixture hit real taps)
        assert float(jnp.abs(dense).sum()) > 0

    def test_own_window_patch_equals_dense(self):
        from prior_flow_tpu.ops.pallas.dccl_gather import (
            OWN_PATCH_ROWS, _place_patches, _scatter_grads_window,
            _scatter_grads_window_patch)

        Hl, Wl = 64, 128
        Q = 256
        rng = np.random.default_rng(2)
        # centres anywhere, including out of range (flow is unbounded)
        cen = jnp.asarray(np.stack([
            rng.uniform(-10, Wl + 10, Q),
            rng.uniform(-10, Hl + 10, Q)], axis=-1)[None].astype(np.float32))
        g = jnp.asarray(rng.normal(size=(1, Q, 81)).astype(np.float32))
        for scale in (1.0, 0.5):
            dense = _scatter_grads_window(g, cen, scale, Hl, Wl, jnp.float32)
            patch, base = _scatter_grads_window_patch(
                g, cen, scale, Hl, Wl, jnp.float32, OWN_PATCH_ROWS)
            placed = _place_patches(Hl, (patch, base))
            np.testing.assert_allclose(np.asarray(placed), np.asarray(dense),
                                       atol=1e-5, rtol=1e-5)

    def test_scatter_own_cross_dispatch(self, monkeypatch):
        """The combined helper with the patch opt-in armed: patch path at
        level 0 (Hl=64 > P), dense fallback at pooled levels — both equal
        to the dense pair."""
        from prior_flow_tpu.ops.pallas import dccl_gather
        from prior_flow_tpu.ops.pallas.dccl_gather import (
            _scatter_grads, _scatter_grads_window, _scatter_own_cross)

        monkeypatch.setattr(dccl_gather, "CROSS_PATCH_ROWS", self.OPT_IN_P)
        tapx, tapy, cen = self._real_tap_coords(Q=128, seed=3)
        rng = np.random.default_rng(4)
        g_own = jnp.asarray(rng.normal(size=(1, 128, 81)).astype(np.float32))
        g_cross = jnp.asarray(rng.normal(size=(1, 128, 81)).astype(np.float32))
        cen = jnp.asarray(cen)
        for Hl, Wl in ((64, 128), (32, 64)):
            dense = (_scatter_grads_window(g_own, cen, 1.0, Hl, Wl,
                                           jnp.float32)
                     + _scatter_grads(g_cross, jnp.asarray(tapx),
                                      jnp.asarray(tapy), Hl, Wl, jnp.float32))
            got = _scatter_own_cross(g_own, cen, 1.0, g_cross,
                                     jnp.asarray(tapx), jnp.asarray(tapy),
                                     Hl, Wl, jnp.float32)
            np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                                       atol=1e-5, rtol=1e-5)

    @pytest.mark.slow  # exhaustive centre sweep over the real grids (~60 s)
    def test_span_bound_backs_patch_size(self):
        """The exactness precondition of the opt-in: per-query
        contributing-corner row span <= P=48 for every realisable centre,
        swept densely over the real 512x1024 grids at level 0."""
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), ".."))
        from tools.measure_cross_span import span_stats
        from prior_flow_tpu.geometry.grids import rotation_grids

        g = rotation_grids(512, 1024)
        for grid in (g.a2b_w2c_8, g.b2a_w2c_8):
            gy = np.asarray(grid[..., 1], np.float64)
            _, span_q, _, _ = span_stats(gy, 64, 1.0, step=0.5)
            assert span_q <= self.OPT_IN_P, (span_q, self.OPT_IN_P)


class TestOnTheFlyQueryChunk:
    def test_chunked_equals_unchunked(self, rng):
        """The lax.map query chunking (the 2048x4096 compile-OOM fix) is a
        pure restructure: identical tap values and back-rotation to the
        unchunked graph on the same inputs."""
        from prior_flow_tpu.ops.corr import DCCLOnTheFly

        B, h, w, C = 1, 8, 16, 32
        Q = h * w
        f1 = jnp.asarray(rng.normal(size=(B, h, w, C)).astype(np.float32))
        f2 = jnp.asarray(rng.normal(size=(B, h, w, C)).astype(np.float32))
        pyr = DCCLOnTheFly.build_pyramid(f1, f2, num_levels=3)
        coords = jnp.asarray(
            rng.uniform(size=(B, h, w, 2)).astype(np.float32)
        ) * jnp.asarray([w - 1.0, h - 1.0])
        # dynamic back grid -> cycle_bilinear_sample back-rotation path
        grid_back = jnp.asarray(
            rng.uniform(size=(B, h, w, 2)).astype(np.float32)
        ) * jnp.asarray([w - 1.0, h - 1.0])
        grid_w2c = grid_back[0]  # (h, w, 2) broadcast branch

        dense = DCCLOnTheFly(num_levels=3, query_chunk=-1)
        chunked = DCCLOnTheFly(num_levels=3, query_chunk=Q // 4)
        o1 = dense(coords, pyr, pyr, grid_w2c, grid_back)
        o2 = chunked(coords, pyr, pyr, grid_w2c, grid_back)
        for a, b in zip(o1, o2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)

    def test_auto_threshold_leaves_small_q_unchunked(self):
        from prior_flow_tpu.ops.corr import DCCLOnTheFly
        # 512x1024 production shape: Q = 8192 < QUERY_CHUNK_AUTO, so the
        # headline onthefly config keeps its round-4-measured graph
        assert 8192 <= DCCLOnTheFly.QUERY_CHUNK_AUTO
