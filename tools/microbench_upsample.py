"""Convex-upsample forward+backward formulation shootout (B=4, 64x128).

The training profile shows ~300 ms/step in the upsample backward: the
6-D einsum layouts (B,h,w,9,8,8) force relayout-heavy fusions.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

B, h, w = 4, 64, 128
from tools._timing import N, timeit  # noqa: E402


def neigh_of(f, dtype):
    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.stack(
        [fp[:, ky:ky + h, kx:kx + w, :] for ky in range(3)
         for kx in range(3)], axis=3).astype(dtype)


def up_v0(flow, mask):
    m = mask.reshape(B, h, w, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)
    f = 8.0 * flow
    neigh = neigh_of(f, f.dtype)
    up = jnp.einsum("bhwkij,bhwkc->bhwijc", m.astype(f.dtype), neigh)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(B, 8 * h, 8 * w, 2)
    return up


def up_v1(flow, mask):
    m = mask.reshape(B, h, w, 9, 64)
    m = jax.nn.softmax(m, axis=3)
    f = 8.0 * flow
    neigh = neigh_of(f, f.dtype)
    up = jnp.einsum("bhwkp,bhwkc->bhwpc", m.astype(f.dtype), neigh)
    up = up.reshape(B, h, w, 8, 8, 2).transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(B, 8 * h, 8 * w, 2)


def up_v2(flow, mask):
    # per-channel broadcast-multiply-sum: no einsum, 5-D max
    m = mask.reshape(B, h, w, 9, 64)
    m = jax.nn.softmax(m, axis=3)
    f = 8.0 * flow
    neigh = neigh_of(f, f.dtype)          # (B,h,w,9,2)
    md = m.astype(f.dtype)
    upx = jnp.sum(md * neigh[..., 0:1], axis=3)   # (B,h,w,64)
    upy = jnp.sum(md * neigh[..., 1:2], axis=3)
    up = jnp.stack([upx, upy], axis=-1)           # (B,h,w,64,2)
    up = up.reshape(B, h, w, 8, 8, 2).transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(B, 8 * h, 8 * w, 2)


def up_v3(flow, mask):
    # matmul over k with (p+c) fused on the output axis: (B*h*w, 9) x ...
    m = mask.reshape(B * h * w, 9, 64)
    m = jax.nn.softmax(m, axis=1)
    f = 8.0 * flow
    neigh = neigh_of(f, f.dtype).reshape(B * h * w, 9, 2)
    up = jax.lax.dot_general(
        neigh.astype(jnp.float32), m.astype(jnp.float32),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)       # (BHW, 2, 64)
    up = up.reshape(B, h, w, 2, 8, 8).transpose(0, 1, 4, 2, 5, 3)
    return up.reshape(B, 8 * h, 8 * w, 2).astype(f.dtype)


def main():
    rng = np.random.default_rng(0)
    flow = jnp.asarray(rng.normal(size=(B, h, w, 2)).astype(np.float32) * 3)
    mask = jnp.asarray(rng.normal(size=(B, h, w, 576)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    gt = jnp.asarray(rng.normal(size=(B, 8 * h, 8 * w, 2)
                                ).astype(np.float32))

    print(f"device: {jax.devices()[0]}  N={N}")
    fns = [("v0 einsum 6d (current)", up_v0), ("v1 einsum p-flat", up_v1),
           ("v3 batched dot", up_v3)]
    # check equivalence
    ref = None
    for name, fn in fns:
        o = np.asarray(jax.jit(fn)(flow, mask), np.float32)
        if ref is None:
            ref = o
        else:
            err = np.abs(o - ref).max()
            assert err < 2e-2, (name, err)
    for name, fn in fns:
        def fwd(c, flow, mask):
            return fn(flow + c, mask)
        timeit(f"fwd  {name}", fwd, flow, mask)

        def bwd(c, flow, mask):
            def loss(fl, mk):
                return jnp.abs(fn(fl, mk) - gt).sum()
            g1, g2 = jax.grad(loss, argnums=(0, 1))(flow + c, mask)
            return g1.sum() + g2.sum().astype(jnp.float32)

        def bwd_body(c, flow, mask):
            return jnp.asarray(bwd(c, flow, mask))[None]
        timeit(f"f+b  {name}", bwd_body, flow, mask)


if __name__ == "__main__":
    main()
