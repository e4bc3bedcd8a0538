"""Checkpoint tests: torch-name mapping, FlyingThings graft semantics, and
Orbax round-trip of the full training state."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prior_flow_tpu.checkpoint.convert import (
    _flax_path,
    convert_state_dict,
    convert_things_ckpt,
)


class TestNameMapping:
    def test_conv_and_norm_paths(self):
        assert _flax_path("fnet.conv1.weight") == (("fnet", "conv1"), "weight", "params")
        assert _flax_path("fnet.layer1.0.conv1.bias") == (
            ("fnet", "layer1_0", "conv1"), "bias", "params")
        assert _flax_path("cnet.norm1.running_mean") == (
            ("cnet", "norm1"), "mean", "batch_stats")
        assert _flax_path("ODDC.mask.0.weight") == (
            ("ODDC", "mask_0"), "weight", "params")
        assert _flax_path("update_block.gru.convz1.weight") == (
            ("update_block", "gru", "convz1"), "weight", "params")
        # duplicates and counters are skipped
        assert _flax_path("cnet.layer2.0.downsample.1.weight")[2] == "skip"
        assert _flax_path("cnet.norm1.num_batches_tracked")[2] == "skip"

    def test_downsample_conv_kept(self):
        assert _flax_path("fnet.layer2.0.downsample.0.weight") == (
            ("fnet", "layer2_0", "downsample_0"), "weight", "params")


class TestConvert:
    def test_conv_kernel_layout(self):
        w = np.arange(2 * 3 * 5 * 7, dtype=np.float32).reshape(2, 3, 5, 7)
        out = convert_state_dict({"fnet.conv1.weight": w,
                                  "fnet.conv1.bias": np.zeros(2, np.float32)})
        k = out["params"]["fnet"]["conv1"]["kernel"]
        assert k.shape == (5, 7, 3, 2)  # OIHW -> HWIO
        np.testing.assert_array_equal(k, np.transpose(w, (2, 3, 1, 0)))

    def test_module_prefix_stripped(self):
        w = np.zeros((4, 4, 3, 3), np.float32)
        out = convert_state_dict({"module.fnet.conv1.weight": w})
        assert "fnet" in out["params"]

    def test_template_mismatch_raises(self):
        w = np.zeros((4, 4, 3, 3), np.float32)
        template = {"params": {"fnet": {"conv1": {
            "kernel": np.zeros((3, 3, 4, 4)), "bias": np.zeros(4)}}}}
        with pytest.raises(ValueError):
            convert_state_dict({"fnet.conv1.weight": w}, template=template)


class TestThingsGraft:
    def test_oddc_seeded_from_update_block(self):
        """ODDC gru/flow_head/mask come from the checkpoint's update_block;
        unmatched ODDC encoder weights keep their template values
        (reference load_things_ckpt, prior_raft.py:85-104)."""
        k = np.ones((3, 3, 4, 4), np.float32) * 7
        sd = {
            "module.update_block.gru.convz1.weight":
                np.transpose(k, (3, 2, 0, 1)),  # torch OIHW
        }
        template = {"params": {
            "ODDC": {"gru": {"convz1": {"kernel": np.zeros((3, 3, 4, 4),
                                                           np.float32)}},
                     "encoder": {"convc1_A": {"kernel": np.full((1, 1, 2, 2),
                                                                5.0,
                                                                np.float32)}}},
            "update_block": {"gru": {"convz1": {"kernel": np.zeros(
                (3, 3, 4, 4), np.float32)}}},
        }}
        out = convert_things_ckpt(sd, template)
        np.testing.assert_allclose(
            out["params"]["ODDC"]["gru"]["convz1"]["kernel"], 7.0)
        np.testing.assert_allclose(
            out["params"]["update_block"]["gru"]["convz1"]["kernel"], 7.0)
        np.testing.assert_allclose(
            out["params"]["ODDC"]["encoder"]["convc1_A"]["kernel"], 5.0)


class TestExportRoundTrip:
    def test_torch_jax_torch_roundtrip(self, rng):
        """convert(export(v)) == v for a representative variable tree."""
        from prior_flow_tpu.checkpoint.convert import export_state_dict
        v = {
            "params": {
                "fnet": {"conv1": {"kernel": rng.normal(size=(7, 7, 3, 64)).astype(np.float32),
                                   "bias": rng.normal(size=(64,)).astype(np.float32)},
                         "layer2_0": {"downsample_0": {"kernel": rng.normal(size=(1, 1, 64, 96)).astype(np.float32),
                                                       "bias": np.zeros(96, np.float32)}}},
                "cnet": {"norm1": {"scale": np.ones(64, np.float32),
                                   "bias": np.zeros(64, np.float32)}},
                "ODDC": {"mask_0": {"kernel": rng.normal(size=(3, 3, 128, 256)).astype(np.float32),
                                    "bias": np.zeros(256, np.float32)}},
            },
            "batch_stats": {"cnet": {"norm1": {"mean": np.zeros(64, np.float32),
                                               "var": np.ones(64, np.float32)}}},
        }
        sd = export_state_dict(v)
        assert "module.fnet.conv1.weight" in sd
        assert sd["module.fnet.conv1.weight"].shape == (64, 3, 7, 7)
        assert "module.fnet.layer2.0.downsample.0.weight" in sd
        assert "module.ODDC.mask.0.weight" in sd
        assert "module.cnet.norm1.running_mean" in sd
        back = convert_state_dict(sd, template=v)
        for coll in v:
            def flat(t, p=()):
                o = {}
                for k, x in t.items():
                    o.update(flat(x, p + (k,)) if isinstance(x, dict) else {p + (k,): x})
                return o
            a, b = flat(v[coll]), flat(back[coll])
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])


class TestOrbaxRoundTrip:
    def test_train_state_roundtrip(self, tmp_path):
        from prior_flow_tpu.checkpoint.orbax_io import (restore_train_state,
                                                        save_train_state)
        from prior_flow_tpu.train.optim import make_optimizer
        from prior_flow_tpu.train.trainer import TrainState

        tx, _ = make_optimizer(1e-4, 100)
        params = {"w": jnp.asarray(np.random.default_rng(0).normal(
            size=(4, 4)).astype(np.float32))}
        state = TrainState.create({"params": params}, tx)
        path = str(tmp_path / "ckpt")
        save_train_state(path, state)
        restored = restore_train_state(path, state)
        np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                      np.asarray(state.params["w"]))
        assert int(restored.step) == int(state.step)
