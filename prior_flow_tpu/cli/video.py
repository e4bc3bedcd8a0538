"""Sequence-inference CLI: run flow over an ordered frame directory with
optional warm-start chaining.

Serving workflow the reference lacks: its only inference surface is the
single-pair demo_image.py (reference demo_image.py:20-42), while its video
test sets (ODVista, PanoVOS — core/datasets.py:304-348) have no runner.
Warm start follows the reference's legacy RAFT protocol
(evaluate.py:30-37 / create_sintel_submission: the previous pair's 1/8-res
flow is forward-splatted to the next frame's start positions with
``forward_interpolate`` and fed as ``init_flow``).

    python -m prior_flow_tpu.cli.video --model ckpt --input frames/ \
        --output flows/ --warm_start --viz
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
from glob import glob


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True,
                        help="checkpoint (.pth or orbax dir)")
    parser.add_argument("--input", required=True,
                        help="directory of ordered frames (png/jpg)")
    parser.add_argument("--output", default="flows_out")
    parser.add_argument("--iters", type=int, default=12)
    parser.add_argument("--mixed_precision", action="store_true")
    parser.add_argument("--warm_start", action="store_true",
                        help="chain each pair's init from the previous flow")
    parser.add_argument("--viz", action="store_true",
                        help="also write colorized flow PNGs")
    parser.add_argument("--max_pairs", type=int, default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data import frame_utils
    from ..models import PriOrRAFT
    from ..ops.warp import downflow8
    from ..utils.padder import InputPadder, forward_interpolate
    from .demo_image import load_model_variables

    frames = sorted(
        f for f in glob(osp.join(args.input, "*"))
        if osp.splitext(f)[1].lower() in (".png", ".jpg", ".jpeg"))
    if len(frames) < 2:
        raise SystemExit(f"{args.input}: need >= 2 frames, found {len(frames)}")
    if args.max_pairs is not None:
        if args.max_pairs < 1:
            raise SystemExit(f"--max_pairs must be >= 1, got {args.max_pairs}")
        frames = frames[:args.max_pairs + 1]

    model = PriOrRAFT(mixed_precision=args.mixed_precision)
    example = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = load_model_variables(model, args.model, example)

    def load(path):
        img = np.asarray(frame_utils.read_image(path)).astype(np.float32)
        if img.ndim == 2:
            img = np.tile(img[..., None], (1, 1, 3))
        return jnp.asarray(img[None, :, :, :3])

    @jax.jit
    def infer(variables, im1, im2, init_flow):
        flow_up = model.apply(variables, im1, im2, iters=args.iters,
                              init_flow=init_flow, test_mode=True)
        return flow_up, downflow8(flow_up)

    os.makedirs(args.output, exist_ok=True)
    init = None
    padder = None
    for i in range(len(frames) - 1):
        im1, im2 = load(frames[i]), load(frames[i + 1])
        if padder is None:
            padder = InputPadder(im1.shape)
        im1, im2 = padder.pad(im1, im2)
        if init is None:
            # traced shape must be stable under jit: zero init on frame 0
            init = jnp.zeros((1, im1.shape[1] // 8, im1.shape[2] // 8, 2),
                             jnp.float32)
        flow_up, flow_low = infer(variables, im1, im2, init)
        flow = np.asarray(padder.unpad(flow_up)[0])
        stem = osp.splitext(osp.basename(frames[i]))[0]
        frame_utils.write_flo(osp.join(args.output, f"{stem}.flo"), flow)
        if args.viz:
            from ..utils.flow_viz import omniflow_to_image
            import cv2
            img = omniflow_to_image(flow)
            cv2.imwrite(osp.join(args.output, f"{stem}.png"),
                        img[:, :, ::-1])
        if args.warm_start:
            init = jnp.asarray(forward_interpolate(np.asarray(flow_low[0]))
                               )[None]
        print(f"{stem}: flow range u[{flow[..., 0].min():.2f}, "
              f"{flow[..., 0].max():.2f}] v[{flow[..., 1].min():.2f}, "
              f"{flow[..., 1].max():.2f}]")
    print(f"wrote {len(frames) - 1} flows to {args.output}")


if __name__ == "__main__":
    main()
