"""Training CLI.

Rebuild of train_flow.py's __main__ (train_flow.py:206-245) with the same
hyperparameter surface; canonical recipes from scripts/train_*.sh are
available as presets:

  EFT / City:  60k steps, batch 4, lr 1e-4, wdecay 1e-4, bf16
               (scripts/train_EFT.sh:1-9, train_City.sh:1-9)
  FlowScape:   100k steps, batch 6, lr 1e-4, wdecay 1e-4, bf16
               (scripts/train_FlowScape.sh:1-9)
"""

from __future__ import annotations

import argparse
import logging
import os

PRESETS = {
    "EFT": dict(num_steps=60000, batch_size=4, lr=1e-4, wdecay=1e-4),
    "City": dict(num_steps=60000, batch_size=4, lr=1e-4, wdecay=1e-4),
    "FlowScape": dict(num_steps=100000, batch_size=6, lr=1e-4, wdecay=1e-4),
}


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--project_name", default="PriOr-Flow")
    parser.add_argument("--name", default="EFT")
    parser.add_argument("--stage", required=True,
                        help="training dataset: City | EFT | FlowScape")
    parser.add_argument("--restore_ckpt", default=None)
    parser.add_argument("--validation", type=str, nargs="+", default=[])
    parser.add_argument("--eval_batch_size", type=int, default=1,
                        help="batch the periodic-validation forward "
                             "(identical metrics, amortised TPU dispatch)")
    parser.add_argument("--preset", action="store_true",
                        help="apply the canonical scripts/train_*.sh recipe")

    parser.add_argument("--lr", type=float, default=2e-5)
    parser.add_argument("--num_steps", type=int, default=100000)
    parser.add_argument("--batch_size", type=int, default=6)
    parser.add_argument("--image_size", type=int, nargs="+", default=[384, 512])

    parser.add_argument("--mixed_precision", action="store_true")
    parser.add_argument("--dropout", type=float, default=0.0)
    parser.add_argument("--remat_policy", default="dccl",
                        choices=["dccl", "dots"],
                        help="scan rematerialisation policy: 'dccl' saves "
                             "only the named DCCL lookup results/residuals "
                             "(lowest memory); 'dots' additionally saves "
                             "every matmul/conv output (more memory, less "
                             "backward recompute)")

    parser.add_argument("--grad_mode", default="standard",
                        choices=["standard", "taped"],
                        help="'taped' = single-forward deferred-scatter "
                             "backward (identical gradients, one stacked "
                             "volume scatter per level/branch instead of "
                             "one per GRU iteration; requires the fused "
                             "Pallas lookup path)")
    parser.add_argument("--iters", type=int, default=12)
    parser.add_argument("--val_freq", type=int, default=5000,
                        help="checkpoint + validate every N steps "
                             "(reference VAL_FREQ, train_flow.py:48)")
    parser.add_argument("--wdecay", type=float, default=5e-5)
    parser.add_argument("--epsilon", type=float, default=1e-8)
    parser.add_argument("--clip", type=float, default=1.0)
    parser.add_argument("--gamma", type=float, default=0.8)
    parser.add_argument("--add_noise", action="store_true")

    parser.add_argument("--mesh", type=str, default="auto",
                        help="device mesh: 'auto' = 1D data-parallel over "
                             "all devices; 'DPxSP' (e.g. '2x4') = 2D "
                             "data x space mesh sharding batch AND image "
                             "height (divides the correlation volume "
                             "across chips)")
    parser.add_argument("--save_path", type=str, default="./checkpoints")
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--seed", type=int, default=1234)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.preset and args.stage in PRESETS:
        for k, v in PRESETS[args.stage].items():
            setattr(args, k, v)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)-8s [%(filename)s:%(lineno)d] %(message)s")
    os.makedirs(args.save_path, exist_ok=True)

    from .. import eval as E
    from ..data.datasets import fetch_dataloader
    from ..models import PriOrRAFT
    from ..parallel.mesh import make_mesh, make_mesh_2d
    from ..train.trainer import Trainer, TrainerConfig
    from ..utils.logger import MetricLogger

    import jax

    cfg = TrainerConfig(
        name=args.name, stage=args.stage, lr=args.lr,
        num_steps=args.num_steps, batch_size=args.batch_size,
        iters=args.iters, wdecay=args.wdecay, epsilon=args.epsilon,
        clip=args.clip, gamma=args.gamma, add_noise=args.add_noise,
        mixed_precision=args.mixed_precision, dropout=args.dropout,
        save_path=args.save_path, restore_ckpt=args.restore_ckpt,
        validation=tuple(args.validation), seed=args.seed,
        data_root=args.data_root, val_freq=args.val_freq,
        grad_mode=args.grad_mode,
    )

    # taped gradients need DCCLFused.record — pin the fused Pallas lookup
    # (on TPU 'auto' already resolves to it; elsewhere it runs interpret
    # mode, slow but correct, instead of erroring out)
    lookup = "pallas" if cfg.grad_mode == "taped" else "auto"
    model = PriOrRAFT(dropout=cfg.dropout,
                      mixed_precision=cfg.mixed_precision,
                      remat_policy=args.remat_policy,
                      lookup_mode=lookup)
    if args.mesh == "auto":
        mesh = make_mesh() if len(jax.devices()) > 1 else None
    else:
        parts = args.mesh.lower().split("x")
        if len(parts) != 2 or not all(p.isdigit() for p in parts):
            raise SystemExit(
                f"--mesh expects 'auto' or 'DPxSP' (e.g. 2x4); got "
                f"{args.mesh!r}")
        dp, sp = int(parts[0]), int(parts[1])
        if dp * sp != len(jax.devices()):
            raise SystemExit(
                f"--mesh {args.mesh}: {dp}x{sp}={dp * sp} chips requested "
                f"but {len(jax.devices())} visible")
        mesh = make_mesh_2d(dp, sp)

    logger = MetricLogger.default(
        run_dir=os.path.join(args.save_path, "logs"), name=args.name,
        project=args.project_name, config=vars(args), use_wandb=args.wandb)

    def _mk_val(fn, **kw):
        return lambda model, variables: fn(model, variables,
                                           data_root=args.data_root,
                                           batch_size=args.eval_batch_size,
                                           **kw)

    validators = {
        "City": _mk_val(E.validate_mpf, scene="City"),
        "EFT": _mk_val(E.validate_mpf, scene="EFT"),
        "FlowScape": _mk_val(E.validate_flowscape),
    }

    trainer = Trainer(model, cfg, mesh=mesh, logger=logger,
                      validators=validators)
    loader = fetch_dataloader(args)
    state = trainer.run(loader)
    logger.close()
    return state


if __name__ == "__main__":
    main()
