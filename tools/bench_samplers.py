"""A/B the packed-corner samplers against the 4-gather forms on hardware.

Times the three shipped packed call sites at production shapes:
1. full-res image rotation (img_rotate: 512x1024, 6-channel payload) —
   profiled 9.5 ms/forward on the 4-gather path;
2. flo_rotate at 1/8 res (the per-iteration B->A flow rotation);
3. static_resample cycle_grid primal at 1/8 res, C=2.

Prints one JSON line per case. Run on the chip:  python tools/bench_samplers.py
"""

from __future__ import annotations

import json
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._timing import timed_chain as timed  # noqa: E402

H, W = 512, 1024


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from prior_flow_tpu.geometry import grids as gridlib
    from prior_flow_tpu.ops.samplers import (bilinear_sample,
                                             cycle_grid_sample)

    rng = jax.random.PRNGKey(0)
    g = gridlib.rotation_grids(H, W)

    # 1. full-res rotation, 6 channels (two stacked RGB images)
    img = jax.random.uniform(rng, (1, H, W, 6))
    grid = jnp.broadcast_to(jnp.asarray(g.a2b), (1, H, W, 2))
    for packed in (False, True):
        ms = timed(lambda im, s, p=packed: bilinear_sample(
            im + s * 1e-30, grid, packed=p).sum(), img)
        print(json.dumps({"case": "img_rotate_fullres", "packed": packed,
                          "ms": round(ms, 3)}), flush=True)

    # 2. cycle_grid sample of the w2c grid payload at dynamic coords
    # (flo_rotate's endpoint push, 1/8 res)
    h8, w8 = H // 8, W // 8
    gw2c = jnp.broadcast_to(jnp.asarray(g.b2a_w2c_8), (1, h8, w8, 2))
    coords = jnp.asarray(gridlib.identity_grid(h8, w8))[None] \
        + jax.random.normal(rng, (1, h8, w8, 2)) * 4.0
    for packed in (False, True):
        ms = timed(lambda c, s, p=packed: cycle_grid_sample(
            gw2c, c + s * 1e-30, is_grid=True, packed=p).sum(), coords)
        print(json.dumps({"case": "flo_rotate_grid_push", "packed": packed,
                          "ms": round(ms, 3)}), flush=True)

    # 3. full flo_rotate (ships packed inside; absolute number for docs)
    from prior_flow_tpu.ops.warp import flo_rotate
    flow = jax.random.normal(jax.random.fold_in(rng, 2), (1, h8, w8, 2)) * 3
    ms = timed(lambda f, s: flo_rotate(
        f + s * 1e-30, g.b2a_w2c_8, g.b2a_8).sum(), flow)
    print(json.dumps({"case": "flo_rotate_full_8th", "ms": round(ms, 3)}),
          flush=True)


if __name__ == "__main__":
    main()
