"""Submission writers and ortho augmentor variants — end-to-end on
synthetic trees (reference evaluate.py:24-74, augmentor.py:423-679)."""

import os
import os.path as osp

import numpy as np
import pytest

from prior_flow_tpu.data import augmentor, frame_utils
from test_datasets_all import H, W, _flo, _img

pytestmark = pytest.mark.slow  # e2e/oracle tier: run with -m slow


@pytest.fixture(scope="module")
def tiny_model():
    import jax
    import jax.numpy as jnp

    from prior_flow_tpu.models import PriOrRAFT

    model = PriOrRAFT()
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, img, iters=1)
    return model, variables


class TestSintelSubmission:
    def test_writes_all_sequences(self, tmp_path, tiny_model):
        from prior_flow_tpu.eval.evaluate import create_sintel_submission

        root = str(tmp_path / "sintel")
        for dstype in ("clean", "final"):
            for scene in ("alley_1",):
                for i in range(3):
                    _img(osp.join(root, "test", dstype, scene,
                                  f"frame_{i:04d}.png"), i)
        model, variables = tiny_model
        out = str(tmp_path / "sub")
        create_sintel_submission(model, variables, iters=1, warm_start=True,
                                 output_path=out, data_root=root)
        for dstype in ("clean", "final"):
            flos = sorted(
                (tmp_path / "sub" / dstype / "alley_1").glob("*.flo"))
            assert len(flos) == 2, dstype
            flow = frame_utils.read_flo(str(flos[0]))
            assert flow.shape == (H, W, 2) and np.isfinite(flow).all()


class TestKittiSubmission:
    def test_writes_png16(self, tmp_path, tiny_model):
        from prior_flow_tpu.eval.evaluate import create_kitti_submission

        root = str(tmp_path / "Kitti2015")
        for i in range(2):
            _img(osp.join(root, "testing", "image_2", f"{i:06d}_10.png"), i)
            _img(osp.join(root, "testing", "image_2", f"{i:06d}_11.png"), i)
        model, variables = tiny_model
        out = str(tmp_path / "ksub")
        create_kitti_submission(model, variables, iters=1,
                                output_path=out, data_root=root)
        pngs = sorted((tmp_path / "ksub").glob("*.png"))
        assert len(pngs) == 2
        flow, valid = frame_utils.read_flow_kitti(str(pngs[0]))
        assert flow.shape == (H, W, 2) and valid.shape == (H, W)


class TestOrthoAugmentors:
    def test_dense_ortho_pipeline(self):
        rng = np.random.RandomState(0)
        imgs = [rng.randint(0, 255, (H, W, 3), np.uint8) for _ in range(4)]
        flow = rng.normal(size=(H, W, 2)).astype(np.float32)
        aug = augmentor.FlowAugmentor360Ortho(do_flip=False)
        out = aug(imgs[0], imgs[1], flow, imgs[2], imgs[3],
                  rng=np.random.RandomState(7))
        a1, a2, f, b1, b2 = out
        assert a1.shape == (H, W, 3) and f.shape == (H, W, 2)
        assert b1.shape == (H, W, 3) and b2.shape == (H, W, 3)
        # deterministic under the same rng seed
        out2 = aug(imgs[0], imgs[1], flow, imgs[2], imgs[3],
                   rng=np.random.RandomState(7))
        for x, y in zip(out, out2):
            np.testing.assert_array_equal(x, y)

    def test_sparse_ortho_pipeline(self):
        rng = np.random.RandomState(0)
        imgs = [rng.randint(0, 255, (H, W, 3), np.uint8) for _ in range(4)]
        flow = rng.normal(size=(H, W, 2)).astype(np.float32)
        valid = (rng.uniform(size=(H, W)) > 0.3).astype(np.float32)
        aug = augmentor.SparseFlowAugmentor360Ortho(
            crop_size=(H - 4, W - 8), do_flip=False)
        a1, a2, f, v, b1, b2 = aug(imgs[0], imgs[1], flow, valid,
                                   imgs[2], imgs[3],
                                   rng=np.random.RandomState(3))
        assert f.shape[-1] == 2 and v.shape == f.shape[:2]
        assert b1.shape[-1] == 3


class TestLegacyValidators:
    def test_validate_sintel(self, tmp_path, tiny_model):
        from prior_flow_tpu.eval.evaluate import validate_sintel

        root = str(tmp_path / "sintel")
        for dstype in ("clean", "final"):
            for i in range(3):
                _img(osp.join(root, "training", dstype, "alley_1",
                              f"frame_{i:04d}.png"), i)
            for i in range(2):
                _flo(osp.join(root, "training", "flow", "alley_1",
                              f"frame_{i:04d}.flo"), i)
        model, variables = tiny_model
        res = validate_sintel(model, variables, iters=1, data_root=root,
                              max_samples=1)
        assert np.isfinite(res["clean"]) and np.isfinite(res["final"])

    def test_validate_chairs(self, tmp_path, tiny_model, monkeypatch):
        from prior_flow_tpu.data import datasets
        from prior_flow_tpu.eval.evaluate import validate_chairs

        root = str(tmp_path / "chairs")
        for i in range(2):
            _img(osp.join(root, f"{i:05d}_img1.ppm"), 2 * i)
            _img(osp.join(root, f"{i:05d}_img2.ppm"), 2 * i + 1)
            _flo(osp.join(root, f"{i:05d}_flow.flo"), i)
        split = str(tmp_path / "chairs_split.txt")
        np.savetxt(split, np.array([2, 2]), fmt="%d")
        orig = datasets.FlyingChairs.__init__
        monkeypatch.setattr(
            datasets.FlyingChairs, "__init__",
            lambda self, aug_params=None, split="train", root=root,
            split_file=split: orig(self, aug_params, split, root, split_file))
        model, variables = tiny_model
        res = validate_chairs(model, variables, iters=1, data_root=root,
                              max_samples=1)
        assert np.isfinite(res["chairs"])

    def test_validate_kitti(self, tmp_path, tiny_model):
        from prior_flow_tpu.data import frame_utils as fu
        from prior_flow_tpu.eval.evaluate import validate_kitti

        root = str(tmp_path / "Kitti2015")
        rng = np.random.RandomState(0)
        for i in range(2):
            _img(osp.join(root, "training", "image_2", f"{i:06d}_10.png"), i)
            _img(osp.join(root, "training", "image_2", f"{i:06d}_11.png"), i)
            os.makedirs(osp.join(root, "training", "flow_occ"), exist_ok=True)
            fu.write_flow_kitti(
                osp.join(root, "training", "flow_occ", f"{i:06d}_10.png"),
                rng.uniform(-5, 5, (H, W, 2)).astype(np.float32))
        model, variables = tiny_model
        res = validate_kitti(model, variables, iters=1, data_root=root,
                             max_samples=1)
        assert np.isfinite(res["kitti-epe"]) and np.isfinite(res["kitti-f1"])

    def test_validate_kitti_batched_matches_batch1(self, tmp_path, tiny_model):
        """Batched legacy validator (kitti padder mode + valid mask through
        _iter_flows) reproduces the batch-1 numbers, incl. the repeat-padded
        final group (2 samples at batch_size=2 after a 1-sample flush)."""
        from prior_flow_tpu.data import frame_utils as fu
        from prior_flow_tpu.eval.evaluate import validate_kitti

        root = str(tmp_path / "Kitti2015")
        rng = np.random.RandomState(0)
        for i in range(3):
            _img(osp.join(root, "training", "image_2", f"{i:06d}_10.png"), i)
            _img(osp.join(root, "training", "image_2", f"{i:06d}_11.png"), i)
            os.makedirs(osp.join(root, "training", "flow_occ"), exist_ok=True)
            fu.write_flow_kitti(
                osp.join(root, "training", "flow_occ", f"{i:06d}_10.png"),
                rng.uniform(-5, 5, (H, W, 2)).astype(np.float32))
        model, variables = tiny_model
        r1 = validate_kitti(model, variables, iters=1, data_root=root,
                            max_samples=3)
        r2 = validate_kitti(model, variables, iters=1, data_root=root,
                            max_samples=3, batch_size=2)
        assert np.isclose(r1["kitti-epe"], r2["kitti-epe"], rtol=1e-4)
        assert np.isclose(r1["kitti-f1"], r2["kitti-f1"], rtol=1e-4)
