"""Evaluation CLI.

Rebuild of evaluate.py's __main__ (evaluate.py:400-429) with the same flag
surface (--model/--dataset/--scene/--mixed_precision/--dropout/--regions)
plus --data_root/--iters/--max_samples/--eval_batch_size conveniences.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True, help="checkpoint (.pth or orbax dir)")
    parser.add_argument("--dataset",
                        choices=["MPFDataset", "FlowScape", "City100"],
                        required=True)
    parser.add_argument("--scene", default="EFT",
                        choices=["City", "EFT", "cloud", "fog", "rain",
                                 "sunny", "all"])
    parser.add_argument("--mixed_precision", action="store_true")
    parser.add_argument("--dropout", type=float, default=0.0)
    parser.add_argument("--regions", action="store_true")
    parser.add_argument("--iters", type=int, default=None,
                        help="GRU iterations (default 12; 24 for City100, "
                             "matching the reference validators)")
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--max_samples", type=int, default=None)
    # beyond-reference: batch the eval forward (identical per-sample
    # metrics; amortises TPU dispatch — see eval/evaluate.py::_iter_flows)
    parser.add_argument("--eval_batch_size", type=int, default=1)
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

    default_iters = 24 if args.dataset == "City100" else 12
    kw = dict(iters=args.iters if args.iters is not None else default_iters,
              data_root=args.data_root, max_samples=args.max_samples,
              batch_size=args.eval_batch_size)
    if args.dataset == "City100":
        # the reference's validate_city_regions path (evaluate.py:172-230):
        # City test split with the extra cos-weighted sd_uni metric and an
        # iters=24 default (evaluate.py:173)
        E.validate_city_regions(model, variables, **kw)
    elif args.dataset == "MPFDataset":
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
