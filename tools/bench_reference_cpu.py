"""Same-host CPU anchor: the PyTorch reference vs our JAX build.

The reference publishes no throughput numbers (BASELINE.md), and no CUDA GPU
is reachable from this environment, so this tool produces the one comparison
that IS measurable here: both stacks' 512x1024 / 12-iteration forward on the
same CPU. The ratio grounds BASELINE.md's RTX 3090 estimate (see the
"Baseline methodology" section there).

Runs the PUBLIC reference code at /root/reference purely as a benchmark
oracle (cuda-calls no-op-patched, same trick as tests/test_torch_parity.py).

Usage: JAX_PLATFORMS=cpu python tools/bench_reference_cpu.py [--size 512 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types
from types import SimpleNamespace

REF = "/root/reference/PriOr-RAFT"


def bench_reference(H, W, iters, runs):
    import numpy as np
    import torch

    if "timm" not in sys.modules:
        sys.modules["timm"] = types.ModuleType("timm")
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        oc.OmegaConf = object
        oc.ListConfig = list
        sys.modules["omegaconf"] = oc
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import core.prior_raft as ref_prior_raft

    torch.manual_seed(0)
    args = SimpleNamespace(dropout=0.0, mixed_precision=False)
    model = ref_prior_raft.PriOr_RAFT(args).eval()
    img1 = torch.randn(1, 3, H, W) * 40 + 127
    img2 = torch.randn(1, 3, H, W) * 40 + 127
    with torch.no_grad():
        model(img1, img2, iters=2, test_mode=True)  # warmup
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            model(img1, img2, iters=iters, test_mode=True)
            times.append(time.perf_counter() - t0)
    return min(times)


def bench_ours(H, W, iters, runs):
    # force the CPU backend regardless of site-level platform plugins
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp

    from prior_flow_tpu.models import PriOrRAFT
    assert jax.default_backend() == "cpu", jax.default_backend()

    model = PriOrRAFT(mixed_precision=False, lookup_mode="mxu")
    rng = jax.random.PRNGKey(0)
    img1 = jax.random.uniform(rng, (1, H, W, 3)) * 255.0
    img2 = jax.random.uniform(jax.random.fold_in(rng, 1), (1, H, W, 3)) * 255.0
    variables = model.init(rng, img1, img2, iters=1)
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b, iters=iters,
                                              test_mode=True).sum())
    float(fwd(variables, img1, img2))  # compile; scalar fetch = real sync
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fwd(variables, img1, img2)
        _ = float(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def bench_ours_subprocess(H, W, iters, runs):
    """bench_ours in a clean subprocess: site hooks may register a TPU
    platform plugin at interpreter start, so CPU must be forced via env
    before Python even launches."""
    import subprocess
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disable TPU plugin registration
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    code = (f"from tools.bench_reference_cpu import bench_ours; "
            f"print(bench_ours({H}, {W}, {iters}, {runs}))")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, check=True)
    return float(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    H, W = args.size

    t_ref = bench_reference(H, W, args.iters, args.runs)
    t_ours = bench_ours_subprocess(H, W, args.iters, args.runs)
    print(json.dumps({
        "config": f"{H}x{W}, {args.iters} iters, f32, CPU ({os.cpu_count()} threads)",
        "reference_torch_s": round(t_ref, 3),
        "ours_jax_cpu_s": round(t_ours, 3),
        "speedup_same_host": round(t_ref / t_ours, 3),
    }))


if __name__ == "__main__":
    main()
