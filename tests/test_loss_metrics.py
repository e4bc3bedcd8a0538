"""Loss / metric unit tests: latitude weighting, sequence loss semantics,
great-circle SEPE, region masks."""

import math

import numpy as np
import jax.numpy as jnp

from prior_flow_tpu.eval import metrics as M
from prior_flow_tpu.train.loss import uniform_sequence_loss


class TestSphericalMask:
    def test_normalised(self):
        m = M.spherical_mask(64, 128)
        assert m.shape == (64, 128)
        assert abs(m.sum() - 1.0) < 1e-5

    def test_cos_profile(self):
        m = M.spherical_mask(64, 128)
        # equator rows weigh more than pole rows
        assert m[32, 0] > m[0, 0]
        assert m[0, 0] > 0


class TestSequenceLoss:
    def test_zero_when_exact(self, rng):
        gt = rng.normal(size=(2, 16, 32, 2)).astype(np.float32)
        preds = jnp.asarray(np.stack([gt, gt]))
        valid = jnp.ones((2, 16, 32))
        loss, metrics = uniform_sequence_loss(preds, jnp.asarray(gt), valid)
        assert float(loss) == 0.0
        assert float(metrics["epe"]) == 0.0
        assert float(metrics["1px"]) == 1.0

    def test_gamma_weighting(self, rng):
        gt = np.zeros((1, 8, 16, 2), np.float32)
        ones = np.ones_like(gt)
        valid = jnp.ones((1, 8, 16))
        # only the FIRST of 2 predictions is wrong -> weight gamma^1
        preds1 = jnp.asarray(np.stack([ones, gt]))
        # only the LAST is wrong -> weight gamma^0
        preds2 = jnp.asarray(np.stack([gt, ones]))
        l1, _ = uniform_sequence_loss(preds1, jnp.asarray(gt), valid, gamma=0.8)
        l2, _ = uniform_sequence_loss(preds2, jnp.asarray(gt), valid, gamma=0.8)
        assert abs(float(l1) / float(l2) - 0.8) < 1e-5

    def test_max_flow_exclusion(self):
        gt = np.zeros((1, 8, 16, 2), np.float32)
        gt[0, 0, 0] = [500.0, 0.0]  # excluded: ||gt|| > 400
        preds = jnp.asarray(np.zeros((1, 1, 8, 16, 2), np.float32))
        valid = jnp.ones((1, 8, 16))
        loss, metrics = uniform_sequence_loss(preds, jnp.asarray(gt), valid)
        assert float(loss) == 0.0  # the only wrong pixel is masked

    def test_latitude_weighting_in_loss(self):
        """An error at the pole must cost less than the same error at the
        equator."""
        H, W = 32, 64
        gt = np.zeros((1, H, W, 2), np.float32)
        valid = jnp.ones((1, H, W))
        pole = np.zeros((1, 1, H, W, 2), np.float32)
        pole[0, 0, 0, 0] = [1, 0]
        eq = np.zeros((1, 1, H, W, 2), np.float32)
        eq[0, 0, H // 2, 0] = [1, 0]
        lp, _ = uniform_sequence_loss(jnp.asarray(pole), jnp.asarray(gt), valid)
        le, _ = uniform_sequence_loss(jnp.asarray(eq), jnp.asarray(gt), valid)
        assert float(lp) < float(le)


class TestGreatCircle:
    def test_zero_distance_for_equal_flow(self, rng):
        flow = jnp.asarray(rng.normal(size=(1, 32, 64, 2)).astype(np.float32))
        d = M.great_circle_distance(flow, flow)
        assert float(jnp.abs(d).max()) < 1e-3

    def test_methods_agree(self, rng):
        f1 = jnp.asarray(rng.normal(size=(1, 32, 64, 2)).astype(np.float32) * 3)
        f2 = jnp.asarray(rng.normal(size=(1, 32, 64, 2)).astype(np.float32) * 3)
        dh = np.asarray(M.great_circle_distance(f1, f2, "Haversine"))
        dc = np.asarray(M.great_circle_distance(f1, f2, "Cosine"))
        np.testing.assert_allclose(dh, dc, atol=1e-3)

    def test_quarter_turn_along_equator(self):
        """A flow of W/4 along the equator is a quarter great circle."""
        H, W = 64, 128
        zero = jnp.zeros((1, H, W, 2))
        quarter = jnp.zeros((1, H, W, 2)).at[..., 0].set(W / 4.0)
        d = np.asarray(M.great_circle_distance(quarter, zero))[0]
        np.testing.assert_allclose(d[H // 2, :], math.pi / 2, atol=0.05)

    def test_magnitude_matches_distance_to_zero(self, rng):
        flow = jnp.asarray(rng.normal(size=(1, 32, 64, 2)).astype(np.float32) * 4)
        zero = jnp.zeros_like(flow)
        mag = np.asarray(M.spherical_flow_magnitude(flow))
        dist = np.asarray(M.great_circle_distance(flow, zero))
        np.testing.assert_allclose(mag, dist, atol=1e-4)


class TestPoleMask:
    def test_region_partition(self):
        H, W = 64, 128
        masks = M.region_masks(H, W)
        assert masks["All"].all()
        # Poles + Equator partition the sphere
        assert ((masks["Poles"] ^ masks["Equator"]) == masks["All"]).all()
        # at +-45°: half the rows are polar
        frac = masks["Poles"].mean()
        assert 0.45 < frac < 0.55

    def test_center_is_equator_of_B_view(self):
        H, W = 64, 128
        masks = M.region_masks(H, W)
        # The Center region is the image of the polar caps in the rotated
        # view: two 45-degree spherical caps ~= 29% of sphere area, whose
        # ERP pixel fraction lands around 20% (they sit on the equator where
        # ERP pixels cover the most area).
        frac = masks["Center"].mean()
        assert 0.15 < frac < 0.35

    def test_polemask_d(self):
        pa, pd = M.generate_polemask_d(64, 128)
        assert pa.shape == pd.shape == (64, 128)
        assert set(np.unique(pd)) <= {0, 1}
