"""Evaluation CLI.

Rebuild of evaluate.py's __main__ (evaluate.py:400-429) with the same flag
surface (--model/--dataset/--scene/--mixed_precision/--dropout/--regions)
plus --data_root/--iters/--max_samples conveniences.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True, help="checkpoint (.pth or orbax dir)")
    parser.add_argument("--dataset", choices=["MPFDataset", "FlowScape"],
                        required=True)
    parser.add_argument("--scene", default="EFT",
                        choices=["City", "EFT", "cloud", "fog", "rain",
                                 "sunny", "all"])
    parser.add_argument("--mixed_precision", action="store_true")
    parser.add_argument("--dropout", type=float, default=0.0)
    parser.add_argument("--regions", action="store_true")
    parser.add_argument("--iters", type=int, default=12)
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--max_samples", type=int, default=None)
    # default to full-precision accumulation: benchmark-grade EPE parity
    # with the fp32 reference; pass --precision fastest for throughput
    parser.add_argument("--precision", default="highest",
                        choices=["highest", "fastest"])
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from .. import eval as E
    from ..models import PriOrRAFT
    from .demo_image import load_model_variables

    model = PriOrRAFT(dropout=args.dropout,
                      mixed_precision=args.mixed_precision,
                      precision=None if args.precision == "fastest"
                      else args.precision)
    example = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = load_model_variables(model, args.model, example)

    kw = dict(iters=args.iters, data_root=args.data_root,
              max_samples=args.max_samples)
    if args.dataset == "MPFDataset":
        assert args.scene in ("City", "EFT", "all")
        if args.regions:
            E.validate_mpf_regions(model, variables, scene=args.scene, **kw)
        else:
            E.validate_mpf(model, variables, scene=args.scene, **kw)
    else:
        assert args.scene in ("cloud", "fog", "rain", "sunny", "all")
        if args.regions:
            E.validate_flowscape_regions(model, variables, scene=args.scene, **kw)
        else:
            E.validate_flowscape(model, variables, scene=args.scene, **kw)


if __name__ == "__main__":
    main()
