"""Capture + aggregate a device trace of the production train step.

Builds the canonical batch-4 512x1024/12-iter bf16 train step (same
configuration as ``tools/bench_train_step.py --train-only``), warms it,
profiles a few steps with ``jax.profiler``, then aggregates per-op
device time from the captured xplane into coarse categories (DCCL
kernels, scatters, conv forward vs transpose, norms, copies, ...) so the
backward's wall-clock budget is attributable. Round-4 use: decide whether
anything after the scatter-chain falsification (docs/ARCHITECTURE.md §3)
is still on the table for the <1.5 s/step target.

Usage:  python tools/trace_train_step.py [--taped] [--steps 3]
Writes the raw trace under /tmp/trainstep_trace and prints a category
table plus the top-30 individual ops.
"""
import argparse
import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from prior_flow_tpu.models import PriOrRAFT
from prior_flow_tpu.train.trainer import TrainState, make_train_step
from prior_flow_tpu.train.optim import make_optimizer

H, W = 512, 1024
B = 4
ITERS = 12


def categorize(name: str) -> str:
    n = name.lower()
    if "dccl" in n or "grid_window" in n or "lookup" in n:
        return "dccl kernel"
    if "scatter" in n:
        return "scatter"
    if "transpose" in n and ("conv" in n or "dot" in n):
        return "conv/dot transpose (bwd)"
    if "conv" in n or "dot" in n or "einsum" in n:
        return "conv/dot"
    if "gather" in n or "dynamic-slice" in n or "dynamic_slice" in n:
        return "gather/slice"
    if "reduce-window" in n or "pool" in n:
        return "pool"
    if "copy" in n or "reshape" in n or "bitcast" in n or "convert" in n:
        return "copy/layout"
    if "norm" in n or "rsqrt" in n or "reduce" in n:
        return "reduce/norm"
    if "fusion" in n:
        return "misc fusion"
    return "other"


def _xplane_pb2():
    """Compile tools/xplane.proto (a mirror of the public tsl schema) with
    protoc on first use and import the generated module."""
    import importlib
    import subprocess
    import tempfile

    out = os.path.join(tempfile.gettempdir(), "xplane_gen")
    os.makedirs(out, exist_ok=True)
    here = os.path.dirname(os.path.abspath(__file__))
    gen = os.path.join(out, "xplane_pb2.py")
    if not os.path.exists(gen):
        subprocess.run(["protoc", f"--python_out={out}", "-I", here,
                        os.path.join(here, "xplane.proto")], check=True)
    sys.path.insert(0, out)
    return importlib.import_module("xplane_pb2")


def aggregate(trace_dir: str):
    xplane_pb2 = _xplane_pb2()

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane.pb found under", trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    per_op = defaultdict(float)     # op name -> total device us
    module_ms = 0.0
    for plane in xspace.planes:
        if "device:TPU" not in plane.name:
            continue  # device plane only; host threads double-count
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name == "XLA Modules":
                module_ms += sum(e.duration_ps for e in line.events) / 1e9
            if line.name != "XLA Ops":
                continue  # leaf op executions only
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                # control-flow umbrella events span their contents on the
                # same line — summing them double-counts every inner op
                low = name.split(" = ")[0]
                if ("while" in low or "conditional" in low
                        or low.startswith("jit_") or "call" in low):
                    continue
                per_op[name] += ev.duration_ps / 1e6  # ps -> us
    if not per_op:
        print("no device events parsed from", path)
        return
    print(f"XLA Modules total: {module_ms:.1f} ms "
          f"(per-step wall = total / traced steps)")

    cats = defaultdict(float)
    for name, us in per_op.items():
        cats[categorize(name)] += us
    total = sum(cats.values())
    print(f"\n== device time by category ({path}) ==")
    for cat, us in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{cat:28s} {us / 1e3:9.2f} ms  {100 * us / total:5.1f}%")
    print(f"{'TOTAL':28s} {total / 1e3:9.2f} ms")

    print("\n== top 30 ops ==")
    for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{us / 1e3:9.2f} ms  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--taped", action="store_true")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--trace-dir", default="/tmp/trainstep_trace")
    ap.add_argument("--parse-only", action="store_true",
                    help="skip capture; aggregate an existing trace dir")
    args = ap.parse_args()

    if args.parse_only:
        aggregate(args.trace_dir)
        return

    rng = jax.random.PRNGKey(0)
    model = PriOrRAFT(mixed_precision=True, remat=True, remat_policy="dccl")
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
    state, metrics = step_fn(state, (img1, img2, flow, valid), rng)
    _ = float(metrics["train/loss"])
    print(f"compiled+first step in {time.perf_counter() - t0:.1f}s",
          flush=True)

    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.steps):
        state, metrics = step_fn(state, (img1, img2, flow, valid), rng)
        _ = float(metrics["train/loss"])
    jax.profiler.stop_trace()
    print("trace captured", flush=True)
    aggregate(args.trace_dir)


if __name__ == "__main__":
    main()
