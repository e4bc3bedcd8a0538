"""End-to-end trainer smoke test on a synthetic dataset tree (the closest
thing to the reference's real de-facto verification, SURVEY.md §4)."""

import os

import numpy as np
import pytest

from prior_flow_tpu.data.datasets import MPFDataset, fetch_dataset
from prior_flow_tpu.data.factory import ConcatDataset, DataConfig, build_dataloader
from prior_flow_tpu.data.loader import DataLoader
from prior_flow_tpu.models import PriOrRAFT
from prior_flow_tpu.train.trainer import Trainer, TrainerConfig

from test_data import _make_mpf_tree

pytestmark = pytest.mark.slow  # e2e/oracle tier: run with -m slow


H, W = 64, 128


@pytest.fixture
def mpf_root(tmp_path):
    return _make_mpf_tree(str(tmp_path), n=5, H=H, W=W)


class TestTrainerEndToEnd:
    def test_two_steps_and_checkpoint(self, mpf_root, tmp_path):
        train_root = os.path.join(mpf_root)
        # reuse the test split dir as a fake train split
        os.rename(os.path.join(train_root, "EFTs_Car100"),
                  os.path.join(train_root, "EFTs_Car2000"))
        cfg = TrainerConfig(stage="EFT", lr=1e-4, num_steps=2, batch_size=1,
                            iters=2, save_path=str(tmp_path / "ckpts"),
                            val_freq=10_000, data_root=train_root)
        model = PriOrRAFT(remat=True)
        logged = []
        trainer = Trainer(model, cfg,
                          logger=lambda m, s: logged.append((s, m)))
        ds = fetch_dataset("EFT", train_root)
        loader = DataLoader(ds, batch_size=1, shuffle=True, num_workers=1)
        state = trainer.run(loader)
        assert int(state.step) == cfg.num_steps + 1
        assert os.path.isdir(os.path.join(str(tmp_path / "ckpts"), "final"))
        assert any("train/loss" in m for _, m in logged)
        assert np.isfinite(logged[0][1]["train/loss"])


class TestFullStateResume:
    def test_resume_equals_uninterrupted(self, tmp_path):
        """Train N -> save -> resume -> train M  ==  train N+M straight:
        params bitwise-close, optimizer moments and step counter carried
        (the reference loses optimizer/schedule state on restart,
        train_flow.py:99-104 — full resume is our upgrade, and this test is
        what makes the claim true)."""
        import jax

        root = _make_mpf_tree(str(tmp_path / "data"), n=2, H=H, W=W)
        os.rename(os.path.join(root, "EFTs_Car100"),
                  os.path.join(root, "EFTs_Car2000"))

        def make(save_path, restore=None, num_steps=3):
            cfg = TrainerConfig(stage="EFT", lr=1e-4, num_steps=num_steps,
                                batch_size=1, iters=1, val_freq=2,
                                save_path=save_path, restore_ckpt=restore,
                                data_root=root)
            model = PriOrRAFT(remat=True)
            return Trainer(model, cfg)

        def loader():
            # NO augmentation: the two runs read different positions of the
            # sample stream, so step-aligned equality needs deterministic
            # data (aug randomness is draw-order-, not step-, keyed)
            ds = MPFDataset(aug_params=None, split="train", scene="EFT",
                            root=root)
            return DataLoader(ds, batch_size=1, shuffle=False, num_workers=1)

        p1 = str(tmp_path / "run_full")
        state_full = make(p1).run(loader())

        # the mid-run checkpoint written at step 2 (total_steps == 1)
        ckpt = os.path.join(p1, "2")
        assert os.path.isdir(ckpt)
        p2 = str(tmp_path / "run_resumed")
        t2 = make(p2, restore=ckpt)
        state_res = t2.init_state((1, H, W, 3))
        assert int(state_res.step) == 2  # step counter restored
        state_res = t2.run(loader(), state=state_res)

        assert int(state_res.step) == int(state_full.step)
        for a, b in zip(jax.tree_util.tree_leaves(state_full.params),
                        jax.tree_util.tree_leaves(state_res.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=0)
        for a, b in zip(jax.tree_util.tree_leaves(state_full.opt_state),
                        jax.tree_util.tree_leaves(state_res.opt_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-7)


class TestFactory:
    def test_build_dataloader(self, mpf_root):
        cfg = DataConfig(type="360flow", name="MPFDataset", scene="EFT",
                         split="test", aug_params=None, batch_size=2,
                         num_shards=1, num_workers=1,
                         roots={"MPFDataset": mpf_root})
        loader = build_dataloader(cfg)
        assert len(loader) >= 1

    def test_concat_dataset(self, mpf_root):
        a = MPFDataset(split="test", scene="EFT", root=mpf_root)
        b = MPFDataset(split="test", scene="EFT", root=mpf_root)
        cat = ConcatDataset([a, b])
        assert len(cat) == 2 * len(a)
        ia = cat[0]
        ib = cat[len(a)]
        np.testing.assert_array_equal(np.asarray(ia[0]), np.asarray(ib[0]))
