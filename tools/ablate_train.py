"""Train-step subtraction profile on TPU.

Times one jitted train step (batch 4, 512x1024, 12 iters, bf16, remat) in
several variants to locate the backward-pass budget:

- full            : the real training step (pallas DCCL fwd + scatter VJP)
- novolgrad       : volumes stop_gradiented — removes the DCCL scatter VJP
                    (upper bound on what a faster scatter kernel can win)
- noflawgrad      : flaw-warp inputs stop_gradiented — removes the
                    cycle-sampler scatter VJP of the 256-ch feature maps
- fwdonly         : forward + loss only (no grad) at batch 4

Each variant is a separate HLO graph: first run compiles (minutes through
the remote helper; cached in /tmp/jax_cache), then REPEAT timed runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 4, 512, 1024
ITERS = 12
REPEAT = 3


def build(variant: str):
    import optax

    from prior_flow_tpu.models import PriOrRAFT
    from prior_flow_tpu.ops import corr as C
    from prior_flow_tpu.train.loss import uniform_sequence_loss
    from prior_flow_tpu.train.optim import make_optimizer

    model = PriOrRAFT(mixed_precision=True, lookup_mode="pallas",
                      remat=(variant != "noremat"),
                      remat_policy="dots" if variant == "dots" else "dccl")

    if variant == "novolgrad":
        # wrap the fused lookup so volume cotangents are dropped
        orig = C.DCCLFused.__call__

        def nograd_call(self, cA, cB, pyrA, pyrB, *grids):
            sg = jax.lax.stop_gradient
            stop = lambda pyr: [tuple(sg(x) for x in p) if isinstance(p, tuple)
                                else sg(p) for p in pyr]
            return orig(self, cA, cB, stop(pyrA), stop(pyrB), *grids)
        C.DCCLFused.__call__ = nograd_call
    elif variant == "noflawgrad":
        from prior_flow_tpu.ops import samplers as S
        orig_sample = S.cycle_bilinear_sample

        def nograd_sample(img, coords):
            return orig_sample(jax.lax.stop_gradient(img), coords)
        # only the model module's reference matters for the flaw warps
        import prior_flow_tpu.models.prior_raft as M
        M.cycle_bilinear_sample = nograd_sample

    tx, _ = make_optimizer(1e-4, 1000, 1e-4, 1e-8, 1.0)

    rng = jax.random.PRNGKey(0)
    img1 = jax.random.uniform(rng, (B, H, W, 3)) * 255.0
    img2 = jax.random.uniform(jax.random.fold_in(rng, 1), (B, H, W, 3)) * 255.0
    gt = jax.random.normal(jax.random.fold_in(rng, 2), (B, H, W, 2)) * 5.0
    valid = jnp.ones((B, H, W))
    variables = model.init(rng, img1[:1], img2[:1], iters=1)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    def loss_fn(p):
        v = {"params": p}
        if batch_stats:
            v["batch_stats"] = batch_stats
        preds_A, preds_B = model.apply(v, img1, img2,
                                       iters=ITERS, train=True,
                                       rngs={"dropout": rng})
        lA, _ = uniform_sequence_loss(preds_A, gt, valid)
        lB, _ = uniform_sequence_loss(preds_B, gt, valid)
        return lA + lB

    if variant == "fwdonly":
        fn = jax.jit(lambda p: loss_fn(p))
        args = (params,)
    else:
        # the PRODUCTION step (train/trainer.make_train_step), so the
        # timing covers exactly what Trainer.run executes
        from prior_flow_tpu.train.trainer import TrainState, make_train_step
        state = TrainState.create(variables, tx)
        step = make_train_step(model, tx, iters=ITERS)
        jfn = jax.jit(step, donate_argnums=(0,))
        gt2 = jnp.clip(gt, -50, 50)
        batch = (img1, img2, gt2, valid)

        def fn(st):
            new_state, metrics = jfn(st, batch, rng)
            return new_state, metrics["train/loss"]
        args = (state,)
    return fn, args


def timed(variant):
    fn, args = build(variant)

    def run(a):
        out = fn(*a)
        if isinstance(out, tuple):
            # donated state threads through to the next call
            return (out[0],), float(out[-1])
        return a, float(out)

    t0 = time.perf_counter()
    args, _ = run(args)
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(REPEAT):
        t0 = time.perf_counter()
        args, _ = run(args)
        ts.append(time.perf_counter() - t0)
    return min(ts), compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant", choices=["full", "novolgrad", "noflawgrad",
                                        "fwdonly", "noremat", "dots"])
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    # one variant per process: the monkeypatched variants must not leak
    t, c = timed(args.variant)
    print(json.dumps({"variant": args.variant, "step_s": round(t, 3),
                      "compile_s": round(c, 1)}), flush=True)


if __name__ == "__main__":
    main()
