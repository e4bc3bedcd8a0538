"""Single-branch RAFT model family tests (upstream lookup semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from prior_flow_tpu.models import RAFT, corr_block_lookup
from prior_flow_tpu.ops.corr import build_pyramid
from prior_flow_tpu.ops.samplers import bilinear_sample


class TestCorrBlockLookup:
    def test_no_wrap_semantics(self, rng):
        """Upstream CorrBlock uses the NON-wrapping bilinear sampler
        (core/corr.py:46): windows past the left/right edges read zeros,
        unlike the DCCL cycle sampler."""
        B, h, w = 1, 8, 16
        Q = h * w
        vol = jnp.asarray(rng.normal(size=(B, Q, h, w)).astype(np.float32))
        pyr = tuple(build_pyramid(vol, 2))
        coords = jnp.zeros((B, h, w, 2))  # window extends past x=0
        out = corr_block_lookup(pyr, coords, radius=4)
        assert out.shape == (B, h, w, 2 * 81)
        # taps with x-offset < 0 at x=0 must be exactly zero (zero pad)
        # tap k = i*9+j; i<4 -> x-offset negative
        left_taps = np.asarray(out)[0, 0, 0, :9]  # i=0 block, level 0
        np.testing.assert_allclose(left_taps[1:-1], 0.0, atol=1e-7)

    def test_center_tap_is_diagonal(self, rng):
        B, h, w = 1, 8, 16
        Q = h * w
        vol = rng.normal(size=(B, Q, h, w)).astype(np.float32)
        pyr = tuple(build_pyramid(jnp.asarray(vol), 1))
        gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32))
        coords = jnp.asarray(np.stack([gx, gy], -1)[None])
        out = np.asarray(corr_block_lookup(pyr, coords, radius=4))
        center = out[0, :, :, 40]
        diag = vol[0].reshape(Q, Q)[np.arange(Q), np.arange(Q)]
        np.testing.assert_allclose(center, diag.reshape(h, w), atol=1e-5)


class TestRAFTModel:
    @pytest.fixture(scope="class")
    def model_vars(self):
        model = RAFT()
        img = jnp.zeros((1, 64, 128, 3))
        variables = model.init(jax.random.PRNGKey(0), img, img, iters=1)
        return model, variables

    def test_forward_contract(self, model_vars, rng):
        model, variables = model_vars
        img1 = jnp.asarray(rng.uniform(0, 255, (1, 64, 128, 3)).astype(np.float32))
        img2 = jnp.asarray(rng.uniform(0, 255, (1, 64, 128, 3)).astype(np.float32))
        flow = model.apply(variables, img1, img2, iters=3, test_mode=True)
        assert flow.shape == (1, 64, 128, 2)
        assert np.isfinite(np.asarray(flow)).all()
        preds = model.apply(variables, img1, img2, iters=2)
        assert preds.shape == (2, 1, 64, 128, 2)

    def test_raft_things_checkpoint_name_compat(self, model_vars):
        """Upstream raft-things state-dict keys map onto this model's
        template (name/shape compatibility of the converter)."""
        model, variables = model_vars
        from prior_flow_tpu.checkpoint.convert import _flax_path
        # spot-check representative upstream RAFT keys
        for key, path in [
            ("module.fnet.conv1.weight", ("fnet", "conv1")),
            ("module.cnet.layer2.0.downsample.0.weight",
             ("cnet", "layer2_0", "downsample_0")),
            ("module.update_block.encoder.convc1.weight",
             ("update_block", "encoder", "convc1")),
            ("module.update_block.mask.2.bias",
             ("update_block", "mask_2")),
        ]:
            mods, leaf, coll = _flax_path(key.replace("module.", ""))
            assert mods == path and coll == "params"
            node = variables["params"]
            for m in mods:
                assert m in node, f"{m} missing under {mods}"
                node = node[m]

    @pytest.mark.slow  # a second full legacy-RAFT init+forward compile
    # (~36 s); the small=False contract test above keeps fast coverage
    def test_small_raft(self, rng):
        model = RAFT(small=True)
        img = jnp.asarray(rng.uniform(0, 255, (1, 64, 128, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), img, img, iters=1)
        flow = model.apply(variables, img, img, iters=2, test_mode=True)
        assert flow.shape == (1, 64, 128, 2)
