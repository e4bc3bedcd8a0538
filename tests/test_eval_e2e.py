"""End-to-end evaluator tests on a synthetic MPF tree: exercises padding,
jitted inference, EPE/SEPE aggregation semantics, and region accounting."""

import numpy as np
import pytest

import jax

from prior_flow_tpu import eval as E
from prior_flow_tpu.data.datasets import MPFDataset
from prior_flow_tpu.models import PriOrRAFT

from test_data import _make_mpf_tree

pytestmark = pytest.mark.slow  # e2e/oracle tier: run with -m slow

H, W = 64, 128


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = _make_mpf_tree(str(tmp_path_factory.mktemp("mpf")), n=3, H=H, W=W)
    model = PriOrRAFT()
    img = np.zeros((1, H, W, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img, iters=1)
    return root, model, variables


class TestValidators:
    def test_validate_mpf(self, setup):
        root, model, variables = setup
        res = E.validate_mpf(model, variables, iters=2, scene="EFT",
                             data_root=root, max_samples=2)
        assert set(res) == {"EFT-epe", "EFT-SEPE"}
        assert np.isfinite(res["EFT-epe"]) and res["EFT-epe"] >= 0
        assert np.isfinite(res["EFT-SEPE"]) and res["EFT-SEPE"] >= 0

    def test_validate_mpf_regions_single_pass(self, setup):
        root, model, variables = setup
        res = E.validate_mpf_regions(model, variables, iters=2, scene="EFT",
                                     data_root=root, max_samples=2)
        assert set(res) == {"All", "Equator", "Poles", "Center"}
        for region in res.values():
            assert np.isfinite(region["epe"])
            assert np.isfinite(region["sd"])
        # All is the pixel-weighted combination of Poles+Equator: it must
        # lie between them
        lo = min(res["Poles"]["epe"], res["Equator"]["epe"])
        hi = max(res["Poles"]["epe"], res["Equator"]["epe"])
        assert lo - 1e-6 <= res["All"]["epe"] <= hi + 1e-6

    def test_validate_city_regions_has_sd_uni(self, setup):
        root, model, variables = setup
        # the synthetic tree only has the EFT layout; build a City twin
        import os
        import shutil
        city = os.path.join(root, "City_100_r")
        if not os.path.isdir(city):
            shutil.copytree(os.path.join(root, "EFTs_Car100"), city)
        res = E.validate_city_regions(model, variables, iters=2,
                                      data_root=root, max_samples=1)
        assert "sd_uni" in res["All"]
        assert np.isfinite(res["All"]["sd_uni"])


class TestBatchedEval:
    def test_batched_equals_batch1(self, setup):
        """batch_size>1 groups the forward but must reproduce the batch-1
        metrics (per-sample independence), including the final short batch
        that is repeat-padded and dropped (3 samples at batch_size=2)."""
        root, model, variables = setup
        r1 = E.validate_mpf(model, variables, iters=2, scene="EFT",
                            data_root=root, max_samples=3)
        r2 = E.validate_mpf(model, variables, iters=2, scene="EFT",
                            data_root=root, max_samples=3, batch_size=2)
        assert np.isclose(r1["EFT-epe"], r2["EFT-epe"], rtol=1e-4)
        assert np.isclose(r1["EFT-SEPE"], r2["EFT-SEPE"], rtol=1e-4)

    def test_batched_regions_equals_batch1(self, setup):
        root, model, variables = setup
        r1 = E.validate_mpf_regions(model, variables, iters=2, scene="EFT",
                                    data_root=root, max_samples=2)
        r2 = E.validate_mpf_regions(model, variables, iters=2, scene="EFT",
                                    data_root=root, max_samples=2,
                                    batch_size=2)
        for region in r1:
            assert np.isclose(r1[region]["epe"], r2[region]["epe"], rtol=1e-4)
            assert np.isclose(r1[region]["sd"], r2[region]["sd"], rtol=1e-4)


class TestPerfectPrediction:
    def test_zero_epe_when_prediction_matches_gt(self, setup, tmp_path):
        """Pipe a 'model' that returns the GT through the dense validator:
        EPE and SEPE must be ~0 (validates aggregation plumbing)."""
        root, _, _ = setup
        val = MPFDataset(split="test", scene="EFT", root=root)
        img1, img2, flow_gt, _ = val[0]

        class Oracle:
            def apply(self, variables, i1, i2, iters=12, test_mode=False):
                import jax.numpy as jnp
                return jnp.asarray(flow_gt)[None]

        from prior_flow_tpu.eval.evaluate import _validate_dense
        res = _validate_dense(Oracle(), {}, [
            (img1, img2, flow_gt, None)], iters=2, name="oracle")
        assert res["oracle-epe"] < 1e-5
        assert res["oracle-SEPE"] < 1e-4
