"""Pretrained-inference CLI: run a converted checkpoint on an image pair and
write the flow visualisation.

Rebuild of demo_image.py (demo_image.py:20-42): loads a PriOr-RAFT
checkpoint (torch ``.pth`` via the converter, or a native Orbax directory),
runs test-mode inference, writes ``flow_pr.png``.
"""

from __future__ import annotations

import argparse
import os


def load_image(path):
    import numpy as np

    from ..data import frame_utils

    img = np.asarray(frame_utils.read_image(path)).astype(np.float32)
    if img.ndim == 2:
        img = np.tile(img[..., None], (1, 1, 3))
    return img[None, :, :, :3]  # (1, H, W, 3)


def load_model_variables(model, ckpt_path, example):
    import jax

    if os.path.isdir(ckpt_path):
        # native Orbax checkpoint: either bare variables or a full
        # Trainer-produced TrainState directory
        from ..checkpoint.orbax_io import variables_from_checkpoint
        return variables_from_checkpoint(ckpt_path)
    template = model.init(jax.random.PRNGKey(0), example, example, iters=1)
    from ..checkpoint.convert import convert_state_dict, load_pth
    return convert_state_dict(load_pth(ckpt_path), template=template)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True, help="checkpoint (.pth or orbax dir)")
    parser.add_argument("--image1", default="demo-frames/frame1.png")
    parser.add_argument("--image2", default="demo-frames/frame2.png")
    parser.add_argument("--output", default="flow_pr.png")
    parser.add_argument("--iters", type=int, default=12)
    parser.add_argument("--mixed_precision", action="store_true")
    parser.add_argument("--dropout", type=float, default=0.0)
    parser.add_argument("--gif", action="store_true",
                        help="also write a side-by-side webp animation")
    parser.add_argument("--size", type=int, nargs=2, default=None,
                        metavar=("H", "W"),
                        help="bilinearly resize inputs before inference "
                             "(keeps the ERP aspect; flow is reported at "
                             "the resized resolution)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models import PriOrRAFT
    from ..utils import flow_viz
    from ..utils.padder import InputPadder

    image1 = jnp.asarray(load_image(args.image1))
    image2 = jnp.asarray(load_image(args.image2))
    if args.size is not None:
        H, W = args.size
        shape = (1, H, W, 3)
        image1 = jax.image.resize(image1, shape, "bilinear")
        image2 = jax.image.resize(image2, shape, "bilinear")

    model = PriOrRAFT(dropout=args.dropout,
                      mixed_precision=args.mixed_precision)
    variables = load_model_variables(model, args.model, image1)

    padder = InputPadder(image1.shape)
    i1, i2 = padder.pad(image1, image2)
    flow = model.apply(variables, i1, i2, iters=args.iters, test_mode=True)
    flow = np.asarray(padder.unpad(flow))[0]

    vis = flow_viz.omniflow_to_image(flow)
    import cv2
    cv2.imwrite(args.output, vis[:, :, ::-1])
    print(f"wrote {args.output}  (flow range u[{flow[..., 0].min():.1f},"
          f"{flow[..., 0].max():.1f}] v[{flow[..., 1].min():.1f},"
          f"{flow[..., 1].max():.1f}])")
    if args.gif:
        out = flow_viz.save_gif(np.asarray(image1)[0], np.asarray(image2)[0],
                                flow, os.path.splitext(args.output)[0],
                                os.path.dirname(args.output) or ".")
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
