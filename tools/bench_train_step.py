"""Training-step and batched-inference timing on the real chip.

Measures (a) the jitted train step at the canonical batch 4
(scripts/train_EFT.sh hyperparameters) and (b) batched inference
throughput, both with the chained-dispatch method bench.py uses.

Flags: --policy dccl|dots (remat policy for the train step),
--train-only / --infer-only to skip the other half.
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, "/root/repo")

from prior_flow_tpu.models import PriOrRAFT
from prior_flow_tpu.train.optim import make_optimizer
from prior_flow_tpu.train.trainer import TrainState, make_train_step

H, W = 512, 1024
ITERS = 12
RUNS = 6


def chain_time(fn, *args, runs=RUNS):
    """Back-to-back dispatch timing: relies on the device's in-order
    execution queue (dispatches overlap the host; one final scalar fetch
    proves all ``runs`` completed). Unlike bench.py there is no data
    dependency threaded between calls — in-order queues make it
    unnecessary for a single-stream measurement."""
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).ravel()[0])
    return (time.perf_counter() - t0) / runs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--policy", default="dccl", choices=["dccl", "dots"])
    ap.add_argument("--train-only", action="store_true")
    ap.add_argument("--infer-only", action="store_true")
    ap.add_argument("--deferred", action="store_true",
                    help="deferred volume gradients (record + stacked "
                         "rebind scatter + replay; models/prior_raft.py)")
    ap.add_argument("--taped", action="store_true",
                    help="single-forward taped backward (one stacked "
                         "scatter per level/branch, no recording scan; "
                         "train/trainer.py::taped_value_and_grad)")
    ap.add_argument("--batch", type=int, default=4,
                    help="train-step batch (4 = EFT recipe; 6 = the "
                         "FlowScape recipe, scripts/train_FlowScape.sh)")
    args = ap.parse_args()
    rng = jax.random.PRNGKey(0)

    # --- batched inference ---
    for B in (() if args.train_only else (1, 2, 4)):
        model = PriOrRAFT(mixed_precision=True)
        img1 = jax.random.uniform(rng, (B, H, W, 3)) * 255.0
        img2 = jax.random.uniform(jax.random.fold_in(rng, 1),
                                  (B, H, W, 3)) * 255.0
        variables = model.init(rng, img1[:1], img2[:1], iters=1)
        fwd = jax.jit(lambda v, a, b: model.apply(
            v, a, b, iters=ITERS, test_mode=True).sum())
        per = chain_time(fwd, variables, img1, img2)
        print(f"inference B={B}: {per * 1e3:8.1f} ms/call  "
              f"{B / per:6.2f} pairs/s", flush=True)

    # --- train step, canonical batch 4 (--batch 6 = FlowScape recipe) ---
    if args.infer_only:
        return
    B = args.batch
    model = PriOrRAFT(mixed_precision=True, remat=True,
                      remat_policy=args.policy,
                      deferred_vol_grad=args.deferred)
    img1 = jax.random.uniform(rng, (B, H, W, 3)) * 255.0
    img2 = jax.random.uniform(jax.random.fold_in(rng, 1),
                              (B, H, W, 3)) * 255.0
    flow = jax.random.normal(jax.random.fold_in(rng, 2), (B, H, W, 2)) * 3.0
    valid = jnp.ones((B, H, W), jnp.float32)
    variables = model.init(rng, img1[:1], img2[:1], iters=1)
    tx, _ = make_optimizer(lr=1e-4, num_steps=100)
    state = TrainState.create(variables, tx)
    step_fn = jax.jit(make_train_step(
        model, tx, iters=ITERS,
        grad_mode="taped" if args.taped else "standard"))
    print("compiling train step...", flush=True)
    t0 = time.perf_counter()
    state2, metrics = step_fn(state, (img1, img2, flow, valid), rng)
    jax.block_until_ready(state2.params)
    _ = float(metrics["train/loss"])
    print(f"compiled+first step in {time.perf_counter() - t0:.1f}s",
          flush=True)
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        state2, metrics = step_fn(state2, (img1, img2, flow, valid), rng)
        _ = float(metrics["train/loss"])
        times.append(time.perf_counter() - t0)
    times.sort()
    tag = args.policy + ("+deferred" if args.deferred else "") + (
        "+taped" if args.taped else "")
    print(f"train step B={B} [{tag}]: "
          f"{times[len(times) // 2] * 1e3:.0f} ms "
          f"({B / times[len(times) // 2]:.2f} pairs/s)", flush=True)


if __name__ == "__main__":
    main()
