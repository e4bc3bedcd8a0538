"""CLI surface tests: flag parity with the reference entry points."""

import numpy as np
import pytest

from prior_flow_tpu.cli.train import PRESETS, build_parser


class TestTrainCLI:
    def test_reference_flag_surface(self):
        """Every train_flow.py flag (reference train_flow.py:206-231) parses."""
        parser = build_parser()
        args = parser.parse_args([
            "--project_name", "PriOr-Flow", "--name", "exp", "--stage", "EFT",
            "--restore_ckpt", "x.pth", "--validation", "EFT", "City",
            "--lr", "0.0001", "--num_steps", "60000", "--batch_size", "4",
            "--image_size", "512", "1024", "--mixed_precision",
            "--dropout", "0.1", "--iters", "12", "--wdecay", "0.0001",
            "--epsilon", "1e-8", "--clip", "1.0", "--gamma", "0.8",
            "--add_noise", "--save_path", "/tmp/ck",
        ])
        assert args.stage == "EFT" and args.mixed_precision
        assert args.validation == ["EFT", "City"]
        assert args.image_size == [512, 1024]

    def test_presets_match_reference_recipes(self):
        """scripts/train_*.sh hyperparameters (reference train_EFT.sh:1-9,
        train_FlowScape.sh:1-9)."""
        assert PRESETS["EFT"] == dict(num_steps=60000, batch_size=4,
                                      lr=1e-4, wdecay=1e-4)
        assert PRESETS["City"]["num_steps"] == 60000
        assert PRESETS["FlowScape"] == dict(num_steps=100000, batch_size=6,
                                            lr=1e-4, wdecay=1e-4)


class TestEvaluateCLI:
    def test_reference_flags(self):
        import argparse
        import prior_flow_tpu.cli.evaluate as ev
        # build the parser without running evaluation
        import unittest.mock as mock
        with mock.patch.object(argparse.ArgumentParser, "parse_args",
                               side_effect=SystemExit) as pa:
            with pytest.raises(SystemExit):
                ev.main([])
        assert pa.called


class TestDemoImageCLI:
    @pytest.mark.slow  # ~42 s; real-frames CLI coverage stays fast via
    # TestVideoCLI::test_sequence_with_warm_start (~20 s, same image I/O,
    # model forward and viz surface)
    def test_demo_frames_end_to_end(self, tmp_path):
        """demo_image on the bundled demo-frames/ pair (the reference's
        demo_image.py:20-42 smoke path): random-init checkpoint, downscaled
        inference, a real flow_pr.png written."""
        import os

        import jax

        from prior_flow_tpu.checkpoint.orbax_io import save_variables
        from prior_flow_tpu.cli import demo_image
        from prior_flow_tpu.models import PriOrRAFT

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        f1 = os.path.join(repo, "demo-frames", "frame1.png")
        f2 = os.path.join(repo, "demo-frames", "frame2.png")

        import jax.numpy as jnp
        model = PriOrRAFT()
        dummy = jnp.zeros((1, 32, 64, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), dummy, dummy, iters=1)
        ckpt = str(tmp_path / "ckpt")
        save_variables(ckpt, variables)

        out = str(tmp_path / "flow_pr.png")
        demo_image.main(["--model", ckpt, "--image1", f1, "--image2", f2,
                         "--output", out, "--iters", "2",
                         "--size", "32", "64"])
        import cv2
        vis = cv2.imread(out)
        assert vis is not None and vis.shape == (32, 64, 3)

    def test_load_image(self, rng, tmp_path):
        import cv2
        from prior_flow_tpu.cli.demo_image import load_image
        img = rng.integers(0, 255, (32, 64, 3)).astype(np.uint8)
        p = str(tmp_path / "f.png")
        cv2.imwrite(p, img[:, :, ::-1])
        out = load_image(p)
        assert out.shape == (1, 32, 64, 3)
        np.testing.assert_array_equal(out[0].astype(np.uint8), img)


class TestVideoCLI:
    def test_sequence_with_warm_start(self, tmp_path):
        import jax
        import numpy as np
        from PIL import Image

        from prior_flow_tpu.checkpoint.orbax_io import save_variables
        from prior_flow_tpu.cli import video
        from prior_flow_tpu.data import frame_utils
        from prior_flow_tpu.models import PriOrRAFT

        H, W = 32, 64
        frames = tmp_path / "frames"
        frames.mkdir()
        rng = np.random.RandomState(0)
        base = rng.randint(0, 255, (H, W, 3), np.uint8)
        for i in range(3):
            Image.fromarray(np.roll(base, 2 * i, axis=1)).save(
                frames / f"{i:04d}.png")

        model = PriOrRAFT()
        import jax.numpy as jnp
        img = jnp.zeros((1, H, W, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), img, img, iters=1)
        ckpt = str(tmp_path / "ckpt")
        save_variables(ckpt, variables)

        out = tmp_path / "flows"
        video.main(["--model", ckpt, "--input", str(frames),
                    "--output", str(out), "--iters", "2", "--warm_start",
                    "--viz"])
        flos = sorted(out.glob("*.flo"))
        pngs = sorted(out.glob("*.png"))
        assert len(flos) == 2 and len(pngs) == 2
        for f in flos:
            flow = frame_utils.read_flo(str(f))
            assert flow.shape == (H, W, 2) and np.isfinite(flow).all()
