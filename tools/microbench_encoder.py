"""Encoder time attribution (see tools/microbench_scan.py for the method).

The production fnet x4 call costs ~31.6 ms/forward at 512x1024 while its
~0.29 TFLOP would take ~1.5 ms at peak — this script localises the gap:
convs vs norms, dtype, and per-stage cost.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from prior_flow_tpu.nn.encoder import BasicEncoder
from prior_flow_tpu.nn.layers import conv

H, Wd = 512, 1024
from tools._timing import N, timeit  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    img = jnp.asarray(rng.uniform(-1, 1, (1, H, Wd, 3)).astype(np.float32))
    img4 = jnp.concatenate([img] * 4, 0)

    print(f"device: {jax.devices()[0]}  N={N}")

    # full fnet in production config (reference: ~31.6 ms in scan bench)
    for norm in ("instance", "none", "group"):
        enc = BasicEncoder(output_dim=256, norm_fn=norm, dtype=jnp.bfloat16)
        v = enc.init(key, img4)

        def ebody(c, v, x):
            return enc.apply(v, x + c).astype(jnp.float32)
        timeit(f"fnet4 norm={norm} bf16", ebody, v, img4)

    # f32 convs for comparison
    enc32 = BasicEncoder(output_dim=256, norm_fn="none", dtype=None)
    v32 = enc32.init(key, img4)

    def e32(c, v, x):
        return enc32.apply(v, x + c)
    timeit("fnet4 norm=none f32", e32, v32, img4)

    # isolated convs at each stage's shape (bf16)
    shapes = [
        ("stem 7x7/2 3->64 @512x1024", (4, H, Wd, 3), 64, 7, 2),
        ("L1 3x3 64->64 @256x512", (4, H // 2, Wd // 2, 64), 64, 3, 1),
        ("L2 3x3 96->96 @128x256", (4, H // 4, Wd // 4, 96), 96, 3, 1),
        ("L3 3x3 128->128 @64x128", (4, H // 8, Wd // 8, 128), 128, 3, 1),
        ("head 1x1 128->256 @64x128", (4, H // 8, Wd // 8, 128), 256, 1, 1),
    ]
    for name, ishape, co, k, s in shapes:
        x = jnp.asarray(rng.normal(size=ishape).astype(np.float32) * .5
                        ).astype(jnp.bfloat16)
        c2 = conv(co, k, stride=s, dtype=jnp.bfloat16)
        cv = c2.init(key, x)

        def cbody(cc, cv, x):
            return c2.apply(cv, x + cc.astype(x.dtype))
        ms = timeit(f"conv {name} bf16", cbody, cv, x)
        ho, wo = ishape[1] // s, ishape[2] // s
        fl = 2 * ishape[0] * ho * wo * co * ishape[3] * k * k
        print(f"    -> {fl / ms / 1e9:8.1f} TFLOP/s "
              f"({fl / 1e9:.1f} GFLOP)", flush=True)

    # instance-norm alone at L1 shape
    from prior_flow_tpu.nn.layers import InstanceNorm
    x = jnp.asarray(rng.normal(size=(4, H // 2, Wd // 2, 64))
                    .astype(np.float32)).astype(jnp.bfloat16)
    inorm = InstanceNorm(dtype=jnp.bfloat16)
    iv = inorm.init(key, x)

    def nbody(c, iv, x):
        return inorm.apply(iv, x + c.astype(x.dtype))
    ms = timeit("instancenorm @4x256x512x64 bf16", nbody, iv, x)
    byt = 2 * x.size * 2
    print(f"    -> {byt / ms / 1e6:8.1f} GB/s eff (rw {byt / 1e6:.0f} MB)",
          flush=True)


if __name__ == "__main__":
    main()
