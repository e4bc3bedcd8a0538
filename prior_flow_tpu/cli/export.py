"""Export CLI: serialize the inference forward as a portable StableHLO
artifact (and optionally verify it against the live model).

Serving-layer capability beyond the reference (which deploys by running
demo_image.py in-repo — reference demo_image.py:20-42; SURVEY.md §1 notes
it has no serving layer).

    python -m prior_flow_tpu.cli.export --model ckpt.pth \
        --size 512 1024 --iters 12 --output prior_raft.stablehlo --check
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True,
                        help="checkpoint (.pth or orbax dir)")
    parser.add_argument("--output", default="prior_raft.stablehlo")
    parser.add_argument("--size", type=int, nargs=2, default=[512, 1024],
                        metavar=("H", "W"))
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--iters", type=int, default=12)
    parser.add_argument("--mixed_precision", action="store_true")
    parser.add_argument("--lookup_mode", default="auto",
                        choices=["auto", "pallas", "mxu", "gather"],
                        help="'mxu' is required for multi-platform exports")
    parser.add_argument("--platforms", nargs="*", default=None,
                        help="lowering platforms (default: current backend),"
                             " e.g. --platforms tpu cpu")
    parser.add_argument("--check", action="store_true",
                        help="reload the artifact and verify it matches the "
                             "live model on a random input")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .. import serving
    from ..models import PriOrRAFT
    from .demo_image import load_model_variables

    model = PriOrRAFT(mixed_precision=args.mixed_precision,
                      lookup_mode=args.lookup_mode)
    example = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = load_model_variables(model, args.model, example)

    shape = (args.batch, args.size[0], args.size[1])
    exported = serving.export_forward(model, variables, shape,
                                      iters=args.iters,
                                      platforms=args.platforms)
    serving.save_exported(exported, args.output)
    print(json.dumps({"output": args.output,
                      **serving.exported_summary(exported)}))

    if args.check:
        rng = jax.random.PRNGKey(0)
        img1 = jax.random.uniform(rng, (args.batch, *args.size, 3)) * 255.0
        img2 = jax.random.uniform(jax.random.fold_in(rng, 1),
                                  (args.batch, *args.size, 3)) * 255.0
        fn = serving.load_exported(args.output)
        got = fn(variables, img1, img2)
        want = serving.make_forward(model, args.iters)(variables, img1, img2)
        err = float(jnp.max(jnp.abs(got - want)))
        print(json.dumps({"check_max_abs_err": err}))
        assert err < 1e-3, f"exported artifact diverges: {err}"


if __name__ == "__main__":
    main()
