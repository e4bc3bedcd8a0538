"""Chip A/B of image-rotation gather formulations (round-5 lever).

The fresh train-step trace (2026-08-20, post-bucketing) shows the
6-channel stacked-image rotation in ``PriOrRAFT.encode``
(models/prior_raft.py:358-360) costing 64 ms/step as ONE packed-corner
gather: `f32[2097152,24]{0,1} <- gather(f32[4,525825,24]{1,2,0})` —
~100x its bandwidth cost (201 MB out + 50 MB in at 820 GB/s = ~0.5 ms),
because layout assignment gives the gather a batch-minormost operand and
a column-major output. The four 2-wide coordinate gathers of the
trainer's ``flo_a2b`` GT prep (4 x ~15 ms/step) show the same shape.

Variants timed here (each jitted alone, chained dispatch):
  packed      current default: 4C pre-shifted concat, one gather
  unpacked    4 separate C-channel corner gathers
  takeflat    static flat-index jnp.take of the (B*(H+1)*(W+1), 4C) quad
  batchsplit  packed, but one gather per batch element (rank-2 operand)
  static4     4 static jnp.take corner reads of the UNPADDED image
              + constant-weight blend (no pad/concat producer at all)
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

sys.path.insert(0, "/root/repo")

from prior_flow_tpu.geometry import grids as gridlib  # noqa: E402
from prior_flow_tpu.ops.samplers import cycle_bilinear_sample  # noqa: E402

B, H, W, C = 4, 512, 1024, 6
RUNS = 12


def corner_consts(grid, H, W):
    """Static corner (flat index, weight) arrays for the wrap-x zero-pad
    semantics of cycle_bilinear_sample (host, float64)."""
    gx = np.mod(np.asarray(grid[..., 0], np.float64).reshape(-1), W)
    gy = np.asarray(grid[..., 1], np.float64).reshape(-1)
    x0 = np.floor(gx)
    y0 = np.floor(gy)
    fx = gx - x0
    fy = gy - y0
    idx, wgt = [], []
    for dy in (0, 1):
        for dx in (0, 1):
            cx, cy = x0 + dx, y0 + dy
            w = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
            valid = (cx <= W - 1) & (cy >= 0) & (cy <= H - 1)
            ix = np.clip(cx, 0, W - 1).astype(np.int64)
            iy = np.clip(cy, 0, H - 1).astype(np.int64)
            idx.append((iy * W + ix).astype(np.int32))
            wgt.append(np.where(valid, w, 0.0).astype(np.float32))
    return idx, wgt


def run(name, fn, *args):
    try:
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        _ = float(out.sum())
        t0 = time.perf_counter()
        for _ in range(RUNS):
            out = f(*args)
        _ = float(out.sum())
        per = (time.perf_counter() - t0) / RUNS
        print(json.dumps({"variant": name, "ms": round(per * 1e3, 3)}),
              flush=True)
        return np.asarray(out)
    except Exception as e:
        print(json.dumps({"variant": name,
                          "error": f"{type(e).__name__}: {str(e)[:160]}"}),
              flush=True)
        return None


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    grid = np.asarray(gridlib.rotation_grids(H, W).a2b, np.float32)
    gridb = jnp.broadcast_to(jnp.asarray(grid), (B, H, W, 2))

    ref = run("packed", lambda im: cycle_bilinear_sample(
        im, gridb, packed=True), img)
    outs = {}
    outs["unpacked"] = run("unpacked", lambda im: cycle_bilinear_sample(
        im, gridb, packed=False), img)

    idx, wgt = corner_consts(grid, H, W)

    def static4(im):
        flat = im.reshape(B * H * W, C)
        off = (np.arange(B, dtype=np.int64)[:, None]
               * (H * W)).astype(np.int32)
        acc = None
        for i, w in zip(idx, wgt):
            full = jnp.asarray((off + i[None, :]).reshape(-1))
            term = jnp.take(flat, full, axis=0) * jnp.asarray(
                np.tile(w, B))[:, None]
            acc = term if acc is None else acc + term
        return acc.reshape(B, H, W, C)

    outs["static4"] = run("static4", static4, img)

    def batchsplit(im):
        parts = [cycle_bilinear_sample(im[i:i + 1], gridb[i:i + 1],
                                       packed=True) for i in range(B)]
        return jnp.concatenate(parts, axis=0)

    outs["batchsplit"] = run("batchsplit", batchsplit, img)

    if ref is not None:
        for k, v in outs.items():
            if v is not None:
                err = float(np.abs(v - ref).max())
                print(json.dumps({"variant": k, "max_abs_err": err}),
                      flush=True)


if __name__ == "__main__":
    main()
