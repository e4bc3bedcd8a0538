"""Data-layer tests: flow-file I/O round trips, dataset index semantics on a
synthetic directory tree, augmentor invariants, and the prefetching loader."""

import os

import numpy as np
import pytest

from prior_flow_tpu.data import frame_utils
from prior_flow_tpu.data.augmentor import FlowAugmentor360, color_jitter, u_clip_np
from prior_flow_tpu.data.datasets import FlowScape, MPFDataset
from prior_flow_tpu.data.loader import DataLoader


class TestFlowIO:
    def test_flo_roundtrip(self, rng, tmp_path):
        flow = rng.normal(size=(17, 23, 2)).astype(np.float32) * 10
        p = str(tmp_path / "f.flo")
        frame_utils.write_flo(p, flow)
        back = frame_utils.read_flo(p)
        np.testing.assert_array_equal(back, flow)

    def test_flo_magic_check(self, tmp_path):
        p = str(tmp_path / "bad.flo")
        with open(p, "wb") as f:
            f.write(b"\x00" * 16)
        with pytest.raises(ValueError):
            frame_utils.read_flo(p)

    def test_kitti_roundtrip(self, rng, tmp_path):
        flow = (rng.normal(size=(16, 24, 2)) * 5).astype(np.float32)
        p = str(tmp_path / "k.png")
        frame_utils.write_flow_kitti(p, flow)
        back, valid = frame_utils.read_flow_kitti(p)
        np.testing.assert_allclose(back, flow, atol=1 / 64.0)
        assert valid.min() == 1

    def test_pfm_read(self, rng, tmp_path):
        data = rng.normal(size=(8, 12)).astype(np.float32)
        p = str(tmp_path / "d.pfm")
        with open(p, "wb") as f:
            f.write(b"Pf\n12 8\n-1.0\n")
            np.flipud(data).astype("<f").tofile(f)
        back = frame_utils.read_pfm(p)
        np.testing.assert_allclose(back, data, atol=1e-6)

    def test_read_gen_dispatch(self, rng, tmp_path):
        flow = rng.normal(size=(6, 8, 2)).astype(np.float32)
        p = str(tmp_path / "x.flo")
        frame_utils.write_flo(p, flow)
        out = frame_utils.read_gen(p)
        np.testing.assert_array_equal(out, flow)
        npy = str(tmp_path / "y.npy")
        np.save(npy, flow)
        np.testing.assert_array_equal(frame_utils.read_gen(npy), flow)


def _make_mpf_tree(root, n=4, H=32, W=64):
    """Synthetic MPF-layout dataset: EFTs_Car100/{image,flow}."""
    import cv2
    rng = np.random.default_rng(0)
    d = os.path.join(root, "EFTs_Car100")
    os.makedirs(os.path.join(d, "image"))
    os.makedirs(os.path.join(d, "flow"))
    for i in range(n):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(d, "image", f"{i:04d}.png"), img)
        flow = (rng.normal(size=(H, W, 2)) * 4).astype(np.float32)
        frame_utils.write_flo(os.path.join(d, "flow", f"{i:04d}.flo"), flow)
    return root


def _make_flowscape_tree(root, n=3, H=32, W=64):
    import cv2
    rng = np.random.default_rng(0)
    base = os.path.join(root, "Flow360", "test", "sunny")
    os.makedirs(os.path.join(base, "img", "seq0"))
    os.makedirs(os.path.join(base, "flow", "seq0"))
    for i in range(n):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(base, "img", "seq0", f"{i:04d}.jpg"), img)
        flow = (rng.normal(size=(H, W, 2)) * 4).astype(np.float32)
        frame_utils.write_flo(os.path.join(base, "flow", "seq0",
                                           f"{i:04d}.flo"), flow)
    return root


class TestDatasets:
    def test_mpf_reversed_pair_order(self, tmp_path):
        """MPF pairs are (frame[i+1], frame[i]) with flow[i+1] — backward
        flow convention (reference datasets.py:248-249)."""
        root = _make_mpf_tree(str(tmp_path))
        d = MPFDataset(split="test", scene="EFT", root=root)
        assert len(d) == 3
        img1_path = d.image_list[0][0]
        img2_path = d.image_list[0][1]
        assert "0001" in img1_path and "0000" in img2_path
        assert "0001" in d.flow_list[0]

    def test_u_wrap_normalisation(self, tmp_path):
        """Horizontal flow is wrapped into [-W/2, W/2) on load
        (reference datasets.py:137-138)."""
        root = _make_mpf_tree(str(tmp_path), H=16, W=32)
        d = MPFDataset(split="test", scene="EFT", root=root)
        # overwrite one flow with out-of-range u
        flow = np.zeros((16, 32, 2), np.float32)
        flow[..., 0] = 30.0  # > W/2 = 16 -> wraps to -2
        frame_utils.write_flo(d.flow_list[0], flow)
        img1, img2, out_flow, valid = d[0]
        np.testing.assert_allclose(out_flow[..., 0], -2.0)
        assert img1.shape == (16, 32, 3) and img1.dtype == np.float32

    def test_flowscape_tree(self, tmp_path):
        root = _make_flowscape_tree(str(tmp_path))
        d = FlowScape(split="test", scene="sunny", root=root)
        assert len(d) == 2
        img1, img2, flow, valid = d[0]
        assert flow.shape == (32, 64, 2)
        assert valid.shape == (32, 64)


class TestAugmentor:
    def test_color_jitter_shape_dtype(self, rng):
        img = rng.integers(0, 255, (32, 64, 3)).astype(np.uint8)
        out = color_jitter(img, rng=np.random.RandomState(0))
        assert out.shape == img.shape and out.dtype == np.uint8

    def test_rotation_roll_consistency(self):
        """Rolling images+flow together preserves the flow's correspondence:
        warp invariance check via explicit construction."""
        rng_state = np.random.RandomState(3)
        aug = FlowAugmentor360(do_flip=False, rng=rng_state)
        aug.rotation_aug_prob = 1.0
        H, W = 16, 32
        img1 = np.arange(H * W * 3, dtype=np.uint8).reshape(H, W, 3)
        img2 = img1[:, ::-1].copy()
        flow = np.ones((H, W, 2), np.float32)
        r1, r2, rf = aug.rotation_transform(img1, img2, flow)
        # symmetric roll: all three rolled by the same k; flow unchanged values
        k = np.argmax(r1[0, :, 0] == img1[0, 0, 0])
        np.testing.assert_array_equal(np.roll(img1, k, axis=1), r1)
        np.testing.assert_array_equal(np.roll(img2, k, axis=1), r2)
        np.testing.assert_array_equal(np.roll(flow, k, axis=1), rf)

    def test_u_clip_np(self):
        assert u_clip_np(17.0, 32) == -15.0
        assert u_clip_np(-17.0, 32) == 15.0

    def test_full_call_shapes(self, rng):
        aug = FlowAugmentor360(do_flip=False, rng=np.random.RandomState(1))
        img1 = rng.integers(0, 255, (64, 128, 3)).astype(np.uint8)
        img2 = rng.integers(0, 255, (64, 128, 3)).astype(np.uint8)
        flow = rng.normal(size=(64, 128, 2)).astype(np.float32)
        o1, o2, of = aug(img1, img2, flow)
        assert o1.shape == img1.shape and of.shape == flow.shape


class TestLoader:
    def test_batching_and_shapes(self, tmp_path):
        root = _make_mpf_tree(str(tmp_path), n=6)
        d = MPFDataset(split="test", scene="EFT", root=root)
        d.is_test = False
        loader = DataLoader(d, batch_size=2, shuffle=True, num_workers=2,
                            drop_last=True)
        batches = list(loader)
        assert len(batches) == len(loader) == 2
        img1, img2, flow, valid = batches[0]
        assert img1.shape == (2, 32, 64, 3)
        assert flow.shape == (2, 32, 64, 2)
        assert valid.shape == (2, 32, 64)

    def test_sharded_loading_partitions_epoch(self, tmp_path):
        """Multi-host sharding: two shards with a common seed see disjoint
        halves of the shuffled epoch."""
        root = _make_mpf_tree(str(tmp_path), n=7)  # 6 pairs
        d = MPFDataset(split="test", scene="EFT", root=root)
        d.is_test = False
        seen = []
        for shard in (0, 1):
            loader = DataLoader(d, batch_size=1, shuffle=True, num_workers=1,
                                seed=42, shard_index=shard, num_shards=2)
            idx = loader._epoch_indices(0)
            assert len(idx) == 3
            seen.append(set(idx.tolist()))
        assert seen[0].isdisjoint(seen[1])
        assert len(seen[0] | seen[1]) == 6

    def test_infinite_stream(self, tmp_path):
        root = _make_mpf_tree(str(tmp_path), n=4)
        d = MPFDataset(split="test", scene="EFT", root=root)
        d.is_test = False
        loader = DataLoader(d, batch_size=1, shuffle=False, num_workers=1)
        it = loader.infinite()
        seen = [next(it) for _ in range(7)]  # > one epoch (3 batches)
        assert len(seen) == 7


class TestDeterministicAugmentation:
    """Per-sample counter-derived augmentation rngs (upgrade over the
    reference's per-worker seeding, core/datasets.py:118-124)."""

    def _loader(self, root, workers, seed=7):
        d = MPFDataset(split="test", scene="EFT", root=root,
                       aug_params={"do_flip": False})
        d.is_test = False
        return DataLoader(d, batch_size=2, shuffle=True, num_workers=workers,
                          seed=seed)

    def test_batches_identical_across_thread_counts(self, tmp_path):
        root = _make_mpf_tree(str(tmp_path), n=7)
        a = [b for _, b in zip(range(6), self._loader(root, 1).infinite())]
        b = [b for _, b in zip(range(6), self._loader(root, 4).infinite())]
        for x, y in zip(a, b):
            for xa, ya in zip(x, y):
                np.testing.assert_array_equal(xa, ya)

    def test_epochs_draw_fresh_augmentations(self, tmp_path):
        root = _make_mpf_tree(str(tmp_path), n=5)
        d = MPFDataset(split="test", scene="EFT", root=root,
                       aug_params={"do_flip": False})
        d.is_test = False
        d.set_epoch(0)
        s0 = d[0]
        d.set_epoch(1)
        s1 = d[0]
        assert any(not np.array_equal(a, b) for a, b in zip(s0, s1))

    def test_resume_replays_batch_sequence(self, tmp_path):
        """infinite(start_batch=k) == batches k.. of a run from scratch."""
        root = _make_mpf_tree(str(tmp_path), n=7)
        full = [b for _, b in zip(range(8), self._loader(root, 2).infinite())]
        resumed = [b for _, b in zip(
            range(5), self._loader(root, 2).infinite(start_batch=3))]
        for x, y in zip(full[3:], resumed):
            for xa, ya in zip(x, y):
                np.testing.assert_array_equal(xa, ya)

    def test_iter_advances_epochs_deterministically(self, tmp_path):
        """Each __iter__ call is the NEXT epoch (fresh shuffle + fresh
        augmentation draws, the torch-DataLoader contract), and the k-th
        iter of a same-seeded fresh loader replays epoch k exactly."""
        root = _make_mpf_tree(str(tmp_path), n=7)
        la = self._loader(root, 2)
        e0 = [b for b in la]
        e1 = [b for b in la]
        assert any(
            not np.array_equal(xa, ya)
            for x, y in zip(e0, e1) for xa, ya in zip(x, y))

        lb = self._loader(root, 2)
        f0 = [b for b in lb]
        f1 = [b for b in lb]
        for ep_a, ep_b in ((e0, f0), (e1, f1)):
            assert len(ep_a) == len(ep_b)
            for x, y in zip(ep_a, ep_b):
                for xa, ya in zip(x, y):
                    np.testing.assert_array_equal(xa, ya)

        # __iter__ epochs and the infinite() stream are the SAME sequence
        inf = [b for _, b in zip(range(len(e0) + len(e1)),
                                 self._loader(root, 2).infinite())]
        for x, y in zip(e0 + e1, inf):
            for xa, ya in zip(x, y):
                np.testing.assert_array_equal(xa, ya)
