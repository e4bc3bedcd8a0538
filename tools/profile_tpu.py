"""Component-level TPU timing for the PriOr-RAFT forward pass.

Times each stage (encoders, cost volume, DCCL variants, flaw warps,
flo_rotate, update blocks, convex upsample) in isolation with forced host
syncs, to locate the wall-clock budget of the 512x1024/12-iter benchmark.
"""
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from prior_flow_tpu.geometry import grids as gridlib
from prior_flow_tpu.models import PriOrRAFT
from prior_flow_tpu.models.prior_raft import upsample_flow_convex
from prior_flow_tpu.nn.encoder import BasicEncoder
from prior_flow_tpu.ops import corr as C
from prior_flow_tpu.ops import warp as W
from prior_flow_tpu.ops.samplers import cycle_bilinear_sample

H, Wd = 512, 1024
h8, w8 = H // 8, Wd // 8
Q = h8 * w8
REPEAT = 4


def timeit(name, fn, *args):
    jfn = jax.jit(fn)
    out = jfn(*args)
    _ = float(jnp.asarray(out).ravel()[0])  # force compile+run
    t0 = time.perf_counter()
    for _ in range(REPEAT):
        out = jfn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / REPEAT * 1000
    print(f"{name:36s} {dt:9.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    img = jnp.asarray(rng.uniform(-1, 1, (1, H, Wd, 3)).astype(np.float32))
    fmap = jnp.asarray(rng.normal(size=(1, h8, w8, 256)).astype(np.float32) * 0.5)
    fmap2 = jnp.asarray(rng.normal(size=(1, h8, w8, 256)).astype(np.float32) * 0.5)
    g = gridlib.rotation_grids(H, Wd)

    print(f"device: {jax.devices()[0]}, shape {H}x{Wd}, Q={Q}")

    # encoders (bf16)
    fnet = BasicEncoder(output_dim=256, norm_fn="instance", dtype=jnp.bfloat16)
    fvars = fnet.init(key, img)
    timeit("fnet x4 images (bf16)", lambda v, a: jnp.sum(
        jnp.stack([jnp.sum(x.astype(jnp.float32)) for x in
                   fnet.apply(v, [a, a, a, a])])), fvars, img)

    # cost volume + pyramid
    def volpyr(f1, f2):
        pyr = C.build_pyramid(C.all_pairs_correlation(f1, f2), 4)
        return sum(jnp.sum(p) for p in pyr)
    timeit("cost volume + pyramid (1 branch)", volpyr, fmap, fmap2)

    vol = C.all_pairs_correlation(fmap, fmap2)
    pyr = tuple(C.build_pyramid(vol, 4))
    coords = jnp.asarray(gridlib.identity_grid(h8, w8)[None] +
                         rng.normal(size=(1, h8, w8, 2)).astype(np.float32) * 3)
    ga = jnp.asarray(g.a2b_w2c_8)
    gb = jnp.asarray(g.b2a_8)

    for mode in ("mxu", "gather"):
        dccl = C.DCCL(lookup_mode=mode)

        def call(c, *p):
            own, cross = dccl(c, p[:4], p[4:], ga, gb)
            return jnp.sum(own) + jnp.sum(cross)
        try:
            timeit(f"DCCL 1 call ({mode})", call, coords, *pyr, *pyr)
        except Exception as e:
            print(f"DCCL ({mode}) failed: {e}")

    # own lookup only
    dccl_own = C.DCCL(lookup_mode="mxu")
    centers = coords.reshape(1, Q, 2)
    timeit("own lookup mxu (4 levels)", lambda c, *p: sum(
        jnp.sum(C.lookup_window_mxu(p[i], c / 2.0 ** i, 4)) for i in range(4)),
        centers, *pyr)
    timeit("cross vol sample mxu (4 levels)", lambda c, *p: sum(
        jnp.sum(C.sample_volume_level_mxu(
            p[i], jnp.broadcast_to(c[:, :, None, :], (1, Q, 81, 2))))
        for i in range(4)), centers, *pyr)

    # flaw warp: gather of 256-channel fmap
    timeit("flaw warp + groupwise x2", lambda f1, f2, c: jnp.sum(
        C.groupwise_corr(f1, cycle_bilinear_sample(f2, c), 4)) +
        jnp.sum(C.groupwise_corr(f1, cycle_bilinear_sample(f2, c + 1.0), 4)),
        fmap, fmap2, coords)

    # flo_rotate at 1/8
    flow8 = jnp.asarray(rng.normal(size=(1, h8, w8, 2)).astype(np.float32) * 3)
    timeit("flo_rotate (1/8 res)", lambda f: jnp.sum(
        W.flo_rotate(f, jnp.asarray(g.b2a_w2c_8), gb)), flow8)

    # cross back-rotation: static-grid resample of 81-channel field
    field = jnp.asarray(rng.normal(size=(1, h8, w8, 81)).astype(np.float32))
    timeit("static img_rotate of 81ch field", lambda x: jnp.sum(
        cycle_bilinear_sample(x, jnp.broadcast_to(gb[None], (1, h8, w8, 2)))),
        field)

    # update blocks (bf16)
    from prior_flow_tpu.nn.update import BasicMultiUpdateBlock, BasicUpdateBlock
    oddc = BasicMultiUpdateBlock(dtype=jnp.bfloat16)
    net = jnp.asarray(rng.normal(size=(1, h8, w8, 128)).astype(np.float32))
    corr_feat = jnp.asarray(rng.normal(size=(1, h8, w8, 324)).astype(np.float32))
    flaw = jnp.asarray(rng.normal(size=(1, h8, w8, 4)).astype(np.float32))
    ovars = oddc.init(key, net, net, flow8, corr_feat, flaw, flow8, flaw)
    timeit("ODDC update block (bf16)", lambda v: jnp.sum(
        oddc.apply(v, net, net, flow8, corr_feat, flaw, flow8, flaw)[2]
        .astype(jnp.float32)), ovars)

    # convex upsample
    mask = jnp.asarray(rng.normal(size=(1, h8, w8, 576)).astype(np.float32))
    timeit("convex upsample x2", lambda f, m: jnp.sum(
        upsample_flow_convex(f, m)) + jnp.sum(upsample_flow_convex(f + 1, m)),
        flow8, mask)

    # full-res img_rotate (once per forward)
    timeit("full-res img_rotate 6ch", lambda x: jnp.sum(W.img_rotate(
        jnp.concatenate([x, x], -1), jnp.asarray(g.a2b))), img)


if __name__ == "__main__":
    main()
