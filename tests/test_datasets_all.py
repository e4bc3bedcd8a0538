"""Directory-layout tests for every dataset family.

The MPF/FlowScape trees are covered in test_data.py; this file builds
synthetic trees matching the REFERENCE layouts for the remaining families
(reference core/datasets.py:171-348 for the 360° sets, :351-446 for the
perspective sets) and gates index construction, pair order, and sample
reads — the glob/layout code otherwise never runs before real data.
"""

import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from prior_flow_tpu.data import datasets, frame_utils

H, W = 16, 32


def _img(path, seed=0):
    os.makedirs(osp.dirname(path), exist_ok=True)
    rng = np.random.RandomState(seed)
    Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(path)


def _flo(path, seed=0):
    os.makedirs(osp.dirname(path), exist_ok=True)
    rng = np.random.RandomState(seed)
    frame_utils.write_flo(path, rng.normal(size=(H, W, 2)).astype(np.float32))


def _npy_flow(path, u0=0.0):
    os.makedirs(osp.dirname(path), exist_ok=True)
    flow = np.zeros((H, W, 2), np.float32)
    flow[..., 0] = u0
    np.save(path, flow)


def _pfm_flow(path, seed=0):
    """Color PFM (u, v, junk) as FlyingThings3D ships (read_gen strips the
    last channel, frame_utils.py read_gen)."""
    os.makedirs(osp.dirname(path), exist_ok=True)
    rng = np.random.RandomState(seed)
    data = rng.normal(size=(H, W, 3)).astype(np.float32)
    with open(path, "wb") as f:
        f.write(b"PF\n%d %d\n-1.0\n" % (W, H))
        np.flipud(data).astype("<f").tofile(f)


def _check_sample(ds, wrap=True):
    img1, img2, flow, valid = ds[0]
    assert img1.shape == (H, W, 3) and img1.dtype == np.float32
    assert flow.shape == (H, W, 2) and valid.shape == (H, W)
    if wrap:
        assert float(np.abs(flow[..., 0]).max()) <= W / 2
    return flow


class TestFlow360:
    def test_layout_and_pairs(self, tmp_path):
        root = str(tmp_path / "FLOW360_train_test")
        for clip in ("clipA", "clipB"):
            for i in range(4):
                _img(osp.join(root, "train", clip, "frames", f"{i:04d}.png"), i)
            for i in range(3):
                _npy_flow(osp.join(root, "train", clip, "fflows",
                                   f"{i:04d}.npy"), u0=W - 1.0)
        ds = datasets.Flow360(split="train", root=root)
        # frames[:-1] paired i,i+1 over len(flows)-1 -> 2 pairs per clip
        assert len(ds) == 4
        assert ds.image_list[0][0].endswith("0000.png")
        assert ds.image_list[0][1].endswith("0001.png")
        assert ds.flow_list[0].endswith("0000.npy")
        flow = _check_sample(ds)
        # u = W-1 wraps into [-W/2, W/2)
        np.testing.assert_allclose(flow[..., 0], -1.0, atol=1e-6)


class TestOmniFlowNet:
    def test_layout_and_pairs(self, tmp_path):
        root = str(tmp_path / "OMNIFLOWNET_DATASET")
        for sc in datasets.OmniFlowNetDataset.SCENES:
            seq = osp.join(root, sc, "seq1")
            for i in range(3):
                _img(osp.join(seq, "images", f"{i:04d}.png"), i)
                _flo(osp.join(seq, "ground_truth", f"{i:04d}.flo"), i)
        ds = datasets.OmniFlowNetDataset(root=root)
        assert len(ds) == 6  # 2 pairs x 3 scenes
        ds_one = datasets.OmniFlowNetDataset(root=root, scene="Forest")
        assert len(ds_one) == 2
        assert ds_one.image_list[0][1].endswith("0001.png")
        _check_sample(ds_one)


class TestVideoOnlySets:
    def test_omniphotos(self, tmp_path):
        root = str(tmp_path / "OmniPhotos")
        for i in range(3):
            _img(osp.join(root, "sceneA", "Input", f"{i:04d}.jpg"), i)
        ds = datasets.OmniPhotos(root=root)
        assert ds.is_test and len(ds) == 2
        img1, img2, extra = ds[0]
        assert img1.dtype == np.float32 and img1.shape == (H, W, 3)
        assert extra.endswith("0000.jpg")

    def test_odvista_hr_and_lr(self, tmp_path):
        root = str(tmp_path / "ODVista")
        for i in range(3):
            _img(osp.join(root, "train", "HR", "vid1", f"{i:04d}.png"), i)
            _img(osp.join(root, "train", "LR_X2", "g0", "vid1",
                          f"{i:04d}.png"), i)
        hr = datasets.ODVista(split="train", root=root, resolution="H")
        lr = datasets.ODVista(split="train", root=root, resolution="x2")
        assert hr.is_test and len(hr) == 2 and len(lr) == 2
        img1, img2, extra = hr[1]
        assert extra.endswith("0001.png")

    def test_panovos(self, tmp_path):
        root = str(tmp_path / "PanoVOS")
        for i in range(4):
            _img(osp.join(root, "val", "JPEGImages", "clip0",
                          f"{i:04d}.jpg"), i)
        ds = datasets.PanoVOS(split="val", root=root)
        assert ds.is_test and len(ds) == 3


class TestMpiSintel:
    def _tree(self, tmp_path):
        root = str(tmp_path / "MPI-Sintel-complete")
        for scene in ("alley_1", "ambush_2"):
            for i in range(3):
                _img(osp.join(root, "training", "clean", scene,
                              f"frame_{i:04d}.png"), i)
                _img(osp.join(root, "test", "clean", scene,
                              f"frame_{i:04d}.png"), i)
            for i in range(2):
                _flo(osp.join(root, "training", "flow", scene,
                              f"frame_{i:04d}.flo"), i)
        return root

    def test_training(self, tmp_path):
        root = self._tree(tmp_path)
        ds = datasets.MpiSintel(split="training", root=root, dstype="clean")
        assert len(ds) == 4 and len(ds.flow_list) == 4
        img1, img2, flow, valid = ds[0]
        assert flow.shape == (H, W, 2)
        # perspective base: NO u-wrap
        assert not ds.wrap_u

    def test_test_split_is_test(self, tmp_path):
        root = self._tree(tmp_path)
        ds = datasets.MpiSintel(split="test", root=root, dstype="clean")
        assert ds.is_test and len(ds) == 4
        img1, img2, (scene, idx) = ds[0]
        assert scene in ("alley_1", "ambush_2") and idx == 0


class TestFlyingChairs:
    def test_split_filtering(self, tmp_path):
        root = str(tmp_path / "FlyingChairs_release" / "data")
        n = 4
        for i in range(n):
            _img(osp.join(root, f"{i:05d}_img1.ppm"), 2 * i)
            _img(osp.join(root, f"{i:05d}_img2.ppm"), 2 * i + 1)
            _flo(osp.join(root, f"{i:05d}_flow.flo"), i)
        split_file = str(tmp_path / "chairs_split.txt")
        np.savetxt(split_file, np.array([1, 2, 1, 2]), fmt="%d")
        tr = datasets.FlyingChairs(split="training", root=root,
                                   split_file=split_file)
        va = datasets.FlyingChairs(split="validation", root=root,
                                   split_file=split_file)
        assert len(tr) == 2 and len(va) == 2
        assert tr.image_list[0][0].endswith("00000_img1.ppm")
        assert tr.image_list[0][1].endswith("00000_img2.ppm")
        _check_sample(tr, wrap=False)


class TestFlyingThings3D:
    def test_pair_directions(self, tmp_path):
        root = str(tmp_path / "Flyingthings")
        seq = "TRAIN/A/0000"
        for i in range(3):
            _img(osp.join(root, "frames_cleanpass", seq, "left",
                          f"{i:04d}.png"), i)
        for d in ("into_future", "into_past"):
            for i in range(3):
                _pfm_flow(osp.join(root, "optical_flow", seq, d, "left",
                                   f"{i:04d}.pfm"), i)
        ds = datasets.FlyingThings3D(root=root, dstype="frames_cleanpass")
        # 2 pairs forward + 2 reversed
        assert len(ds) == 4
        fwd = ds.image_list[0]
        assert fwd[0].endswith("0000.png") and fwd[1].endswith("0001.png")
        rev = ds.image_list[2]
        assert rev[0].endswith("0001.png") and rev[1].endswith("0000.png")
        assert ds.flow_list[2].endswith("0001.pfm")
        img1, img2, flow, valid = ds[0]
        assert flow.shape == (H, W, 2)  # pfm junk channel stripped


class TestKitti:
    def _tree(self, tmp_path, name, imgdir):
        root = str(tmp_path / name)
        rng = np.random.RandomState(0)
        for i in range(2):
            _img(osp.join(root, "training", imgdir, f"{i:06d}_10.png"), i)
            _img(osp.join(root, "training", imgdir, f"{i:06d}_11.png"), i)
            os.makedirs(osp.join(root, "training", "flow_occ"), exist_ok=True)
            frame_utils.write_flow_kitti(
                osp.join(root, "training", "flow_occ", f"{i:06d}_10.png"),
                rng.uniform(-10, 10, (H, W, 2)).astype(np.float32))
        return root

    def test_kitti2015(self, tmp_path):
        root = self._tree(tmp_path, "Kitti2015", "image_2")
        ds = datasets.KITTI(split="training", root=root)
        assert len(ds) == 2 and ds.sparse
        img1, img2, flow, valid = ds[0]
        assert valid.shape == (H, W) and set(np.unique(valid)) <= {0.0, 1.0}

    def test_kitti2012(self, tmp_path):
        root = self._tree(tmp_path, "Kitti2012", "colored_0")
        ds = datasets.KITTI12(split="training", root=root)
        assert len(ds) == 2
        _ = ds[1]


class TestHD1K:
    def test_sequences(self, tmp_path):
        root = str(tmp_path / "hd1k_full_package")
        rng = np.random.RandomState(0)
        for seq in range(2):
            for i in range(3):
                _img(osp.join(root, "hd1k_input", "image_2",
                              f"{seq:06d}_{i:04d}.png"), i)
                os.makedirs(osp.join(root, "hd1k_flow_gt", "flow_occ"),
                            exist_ok=True)
                frame_utils.write_flow_kitti(
                    osp.join(root, "hd1k_flow_gt", "flow_occ",
                             f"{seq:06d}_{i:04d}.png"),
                    rng.uniform(-5, 5, (H, W, 2)).astype(np.float32))
        ds = datasets.HD1K(root=root)
        assert len(ds) == 4  # 2 pairs per sequence, stops at missing seq 2
        img1, img2, flow, valid = ds[0]
        assert flow.shape == (H, W, 2)
