"""DCCL kernel variants: coord-fed vs grid-fused, per level, plus the XLA
cross-coord window einsum they replace (method: tools/microbench_scan.py).
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
from prior_flow_tpu.ops import corr as C
from prior_flow_tpu.ops.pallas.dccl_gather import (dccl_packed_lookup,
                                                   dccl_packed_lookup_grid,
                                                   pack_volume)

H, Wd = 512, 1024
h8, w8 = H // 8, Wd // 8
Q = h8 * w8
from tools._timing import N, timeit  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    g = gridlib.rotation_grids(H, Wd)
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
    gridA3 = gridA if gridA.ndim == 3 else gridA[0]
    gridB3 = gridB if gridB.ndim == 3 else gridB[0]
    crossc = jnp.asarray(
        rng.uniform(0, 60, size=(1, Q, 81, 2)).astype(np.float32))

    print(f"device: {jax.devices()[0]}  N={N}")

    # XLA cross-coord computation for all 4 levels (what grid-fusion kills):
    # one 4Q-concat window einsum per branch, as DCCLFused does
    scales = [1.0, .5, .25, .125]

    def xbody(c, gridA3, cen):
        cen_all = jnp.concatenate([cen * s for s in scales], axis=1) + c
        return C.sample_image_window_mxu(gridA3[None], cen_all, 4)
    timeit("XLA cross-coords 4 levels (1 of 2/iter)", xbody, gridA3, cen)

    for lvl in range(4):
        pA, mA = packed[lvl]
        scale = scales[lvl]

        def kbody(c, pA, mA, cen, crossc):
            pAp = pA + c.astype(pA.dtype)
            o = dccl_packed_lookup(pAp, pA, mA, mA, cen * scale, cen * scale,
                                   crossc, crossc, 1.0, False)
            return o[0]
        timeit(f"coord-fed kernel L{lvl}", kbody, pA, mA, cen, crossc)

        def gbody(c, pA, mA, cen, gridA3, gridB3):
            pAp = pA + c.astype(pA.dtype)
            o = dccl_packed_lookup_grid(pAp, pA, mA, mA, cen, cen,
                                        gridA3, gridB3, scale, False)
            return o[0]
        timeit(f"grid-fused-v2 kernel L{lvl}", gbody, pA, mA, cen,
               gridA3, gridB3)


if __name__ == "__main__":
    main()
