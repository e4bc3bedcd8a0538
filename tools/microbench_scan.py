"""Per-component device timing free of dispatch overhead.

The axon tunnel adds ~8 ms per jit dispatch, so one-shot microbenchmarks
are meaningless below ~10 ms. Here every component is looped N times
INSIDE one jit via ``lax.scan`` with a carry data-dependency (prevents
CSE/DCE), so per-iteration cost = (t_scan(N) - dispatch) / N.

Components mirror one GRU iteration of the production 512x1024 forward
plus the per-forward setup stages.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from prior_flow_tpu.geometry import grids as gridlib
from prior_flow_tpu.nn.encoder import BasicEncoder
from prior_flow_tpu.nn.update import BasicMultiUpdateBlock, BasicUpdateBlock
from prior_flow_tpu.models.prior_raft import upsample_flow_convex
from prior_flow_tpu.ops import corr as C
from prior_flow_tpu.ops import warp as Wp
from prior_flow_tpu.ops.samplers import cycle_bilinear_sample
from prior_flow_tpu.ops.static_resample import resample_static
from prior_flow_tpu.ops.pallas.dccl_gather import (dccl_packed_lookup,
                                                   pack_volume)

H, Wd = 512, 1024
h8, w8 = H // 8, Wd // 8
Q = h8 * w8
from tools._timing import N, timeit  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    g = gridlib.rotation_grids(H, Wd)
    g8 = gridlib.rotation_grids(H, Wd)  # same cache

    fmap = jnp.asarray(rng.normal(size=(1, h8, w8, 256)).astype(np.float32) * .5)
    fmap2 = jnp.asarray(rng.normal(size=(1, h8, w8, 256)).astype(np.float32) * .5)
    vol = C.all_pairs_correlation(fmap, fmap2)
    pyr = [p.astype(jnp.bfloat16) for p in C.build_pyramid(vol, 4)]
    packed = [pack_volume(p) for p in pyr]
    coords = jnp.asarray(gridlib.identity_grid(h8, w8)[None] +
                         rng.normal(size=(1, h8, w8, 2)).astype(np.float32) * 3)
    cen = coords.reshape(1, Q, 2)
    gridA = jnp.asarray(g.a2b_w2c_8)
    gridB = jnp.asarray(g.b2a_w2c_8)
    back = g.b2a_8
    flow8 = jnp.asarray(rng.normal(size=(1, h8, w8, 2)).astype(np.float32) * 3)
    field81 = jnp.asarray(rng.normal(size=(1, h8, w8, 81)).astype(np.float32))
    crossc = jnp.asarray(
        rng.uniform(0, 60, size=(1, Q, 81, 2)).astype(np.float32))

    print(f"device: {jax.devices()[0]}  N={N}")

    # --- DCCL kernel per level (both volumes own+cross fused) ---
    for lvl in range(4):
        pA, mA = packed[lvl]
        scale = 1.0 / 2 ** lvl

        def kbody(c, pA, mA, cen, crossc):
            pAp = pA + c.astype(pA.dtype)
            o = dccl_packed_lookup(pAp, pA, mA, mA, cen, cen,
                                   crossc, crossc, scale, False)
            return o[0]
        timeit(f"dccl kernel L{lvl} (own+cross, 2 vols)", kbody,
               pA, mA, cen, crossc)

    # --- cross-coord window sampling (per level per branch) ---
    def cbody(c, gridA, cen):
        return C.sample_image_window_mxu(gridA[None] + c, cen, 4)
    timeit("sample_image_window_mxu (1 call)", cbody, gridA, cen)

    # --- back-rotation of one 81ch field (static resample) ---
    def bbody(c, field81):
        return resample_static(field81 + c, back)
    timeit("back-rotation 81ch (1 of 8/iter)", bbody, field81)

    # 324-ch once (levels concatenated) for comparison
    field324 = jnp.concatenate([field81] * 4, -1)

    def bbody4(c, f):
        return resample_static(f + c, back)
    timeit("back-rotation 324ch (1 of 2/iter)", bbody4, field324)

    # --- flaw path: 256ch warp + groupwise, x2 per iter ---
    def fbody(c, f1, f2, coords):
        w = cycle_bilinear_sample(f2, coords + c)
        return C.groupwise_corr(f1, w, 4)
    timeit("flaw warp+groupwise (1 of 2/iter)", fbody, fmap, fmap2, coords)

    # --- flo_rotate at 1/8 ---
    def rbody(c, flow8):
        return Wp.flo_rotate(flow8 + c, g8.b2a_w2c_8, g8.b2a_8)
    timeit("flo_rotate 1/8 (1/iter)", rbody, flow8)

    # --- update blocks ---
    oddc = BasicMultiUpdateBlock(dtype=jnp.bfloat16)
    net = jnp.asarray(rng.normal(size=(1, h8, w8, 128)).astype(np.float32))
    corr_feat = jnp.asarray(
        rng.normal(size=(1, h8, w8, 648)).astype(np.float32))
    flaw = jnp.asarray(rng.normal(size=(1, h8, w8, 4)).astype(np.float32))
    ovars = oddc.init(key, net, net, flow8, corr_feat[..., :324], flaw,
                      flow8, flaw)

    def ubody(c, ov, net, corr_feat, flaw, flow8):
        return oddc.apply(ov, net + c, net, flow8, corr_feat[..., :324],
                          flaw, flow8, flaw)[2]
    timeit("ODDC update (1/iter)", ubody, ovars, net, corr_feat, flaw, flow8)

    upd = BasicUpdateBlock(dtype=jnp.bfloat16)
    uvars = upd.init(key, net, net, corr_feat[..., :324], flow8)

    def u2body(c, uv, net, corr_feat, flow8):
        return upd.apply(uv, net + c, net, corr_feat[..., :324], flow8)[2]
    timeit("BasicUpdate B (1/iter)", u2body, uvars, net, corr_feat, flow8)

    # --- convex upsample ---
    mask = jnp.asarray(rng.normal(size=(1, h8, w8, 576)).astype(np.float32))

    def upbody(c, flow8, mask):
        return upsample_flow_convex(flow8 + c, mask)
    timeit("convex upsample (train: 2/iter)", upbody, flow8, mask)

    # --- per-forward setup stages ---
    img = jnp.asarray(rng.uniform(-1, 1, (1, H, Wd, 3)).astype(np.float32))
    fnet = BasicEncoder(output_dim=256, norm_fn="instance",
                        dtype=jnp.bfloat16)
    fvars = fnet.init(key, img)

    def ebody(c, fv, img):
        outs = fnet.apply(fv, [img + c, img, img, img])
        return outs[0].astype(jnp.float32)
    timeit("fnet x4 (1/forward)", ebody, fvars, img)

    cnet = BasicEncoder(output_dim=256, norm_fn="batch",
                        use_running_average=True, dtype=jnp.bfloat16)
    cvars = cnet.init(key, img)

    def c2body(c, cv, img):
        outs = cnet.apply(cv, [img + c, img])
        return outs[0].astype(jnp.float32)
    timeit("cnet x2 (1/forward)", c2body, cvars, img)

    def vbody(c, f1, f2):
        vol = C.all_pairs_correlation(f1 + c, f2)
        pyr = [p.astype(jnp.bfloat16) for p in C.build_pyramid(vol, 4)]
        pk = [pack_volume(p)[0] for p in pyr]
        return pk[0]
    timeit("volume+pyramid+pack (2/forward)", vbody, fmap, fmap2)

    def ibody(c, img):
        six = jnp.concatenate([img + c, img], -1)
        return Wp.img_rotate(six, jnp.asarray(g.a2b))
    timeit("full-res img_rotate 6ch (1/forward)", ibody, img)


if __name__ == "__main__":
    main()
