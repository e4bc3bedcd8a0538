"""Serving subsystem: AOT compile and StableHLO export round-trips.

The reference has no serving layer (SURVEY.md §1); these gate the
beyond-reference export path: the serialized artifact must reproduce the
live model bit-for-bit on the same backend, and the AOT executable must
refuse shape drift instead of silently retracing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prior_flow_tpu import serving
from prior_flow_tpu.models import PriOrRAFT

H, W, ITERS = 32, 64, 2


@pytest.fixture(scope="module")
def model_and_vars():
    model = PriOrRAFT()
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(rng, img, img, iters=1)
    return model, variables


def _pair(batch=1):
    rng = jax.random.PRNGKey(7)
    img1 = jax.random.uniform(rng, (batch, H, W, 3)) * 255.0
    img2 = jax.random.uniform(jax.random.fold_in(rng, 1),
                              (batch, H, W, 3)) * 255.0
    return img1, img2


def test_aot_compile_matches_live(model_and_vars):
    model, variables = model_and_vars
    img1, img2 = _pair()
    compiled = serving.aot_compile(model, variables, (1, H, W), iters=ITERS)
    got = compiled(variables, img1, img2)
    want = serving.make_forward(model, ITERS)(variables, img1, img2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-5)


def test_aot_compile_rejects_shape_drift(model_and_vars):
    model, variables = model_and_vars
    compiled = serving.aot_compile(model, variables, (1, H, W), iters=ITERS)
    img1, img2 = _pair(batch=2)
    with pytest.raises(Exception):
        compiled(variables, img1, img2)


def test_export_roundtrip_through_file(model_and_vars, tmp_path):
    model, variables = model_and_vars
    img1, img2 = _pair()
    exported = serving.export_forward(model, variables, (1, H, W),
                                      iters=ITERS)
    path = str(tmp_path / "prior_raft.stablehlo")
    serving.save_exported(exported, path)
    fn = serving.load_exported(path)
    got = fn(variables, img1, img2)
    want = serving.make_forward(model, ITERS)(variables, img1, img2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-5)
    summary = serving.exported_summary(fn.exported)
    assert summary["platforms"], summary
    assert summary["num_weight_leaves"] > 0


@pytest.mark.slow  # ~32 s subprocess; the export/AOT CONTRACTS stay fast
# via test_export_roundtrip_through_file + test_aot_compile_matches_live —
# this adds only the argparse surface on top
def test_export_cli_writes_and_checks(tmp_path):
    # end-to-end through the CLI: init a model, save a native ckpt the CLI
    # can load, export, and self-check
    from prior_flow_tpu.checkpoint.orbax_io import save_train_state
    from prior_flow_tpu.cli import export as export_cli

    model = PriOrRAFT()
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(rng, img, img, iters=1)
    ckpt = str(tmp_path / "ckpt")
    save_train_state(ckpt, {"params": variables["params"],
                            "batch_stats": variables.get("batch_stats", {})})
    out = str(tmp_path / "m.stablehlo")
    export_cli.main(["--model", ckpt, "--output", out,
                     "--size", str(H), str(W), "--iters", "2", "--check"])
    import os
    assert os.path.getsize(out) > 0
