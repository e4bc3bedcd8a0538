"""Smoke-test CLI: random 512x1024 pair forward, print output shape.

Rebuild of the reference demo.py (demo.py:5-21), made device-agnostic: runs
on whatever jax.devices() provides (TPU or CPU) instead of hard-coding
.cuda().
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--mixed_precision", action="store_true")
    parser.add_argument("--dropout", type=float, default=0.0)
    parser.add_argument("--iters", type=int, default=12)
    parser.add_argument("--height", type=int, default=512)
    parser.add_argument("--width", type=int, default=1024)
    args = parser.parse_args(argv)

    import jax

    from ..models import PriOrRAFT

    model = PriOrRAFT(dropout=args.dropout,
                      mixed_precision=args.mixed_precision)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    image1 = jax.random.uniform(k1, (1, args.height, args.width, 3)) * 255
    image2 = jax.random.uniform(k2, (1, args.height, args.width, 3)) * 255

    t0 = time.perf_counter()
    variables = model.init(k3, image1, image2, iters=1)
    print(f"init: {time.perf_counter() - t0:.1f}s on {jax.devices()[0]}")

    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b, iters=args.iters,
                                              test_mode=True))
    t0 = time.perf_counter()
    flow = fwd(variables, image1, image2)
    flow.block_until_ready()
    print(f"first forward (incl. compile): {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    flow = fwd(variables, image1, image2)
    flow.block_until_ready()
    print(f"steady-state forward: {time.perf_counter() - t0:.3f}s")
    print("output:", flow.shape, flow.dtype)  # (1, H, W, 2)


if __name__ == "__main__":
    main()
