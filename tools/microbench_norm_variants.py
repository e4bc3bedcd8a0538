"""Instance-norm formulation shootout INSIDE the full encoder.

In isolation every variant is ~0.5 ms; in context the reduce forces XLA to
materialise relayout copies of the conv activations (2.7 GB/forward). This
measures which stats formulation avoids the copies.
"""
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import flax.linen as nn

from prior_flow_tpu.nn import layers as L
from prior_flow_tpu.nn.encoder import BasicEncoder

H, Wd = 512, 1024
from tools._timing import N, timeit  # noqa: E402


def finish(x, m, var, eps, out_dtype):
    scale = jax.lax.rsqrt(var + eps)
    if x.dtype == jnp.float32:
        return ((x - m) * scale).astype(out_dtype)
    return ((x - m.astype(x.dtype)) * scale.astype(x.dtype)).astype(out_dtype)


class NormEinsum(nn.Module):
    """Stats via dot_general (MXU consumes the conv's native layout)."""
    epsilon: float = 1e-5
    dtype: any = None

    @nn.compact
    def __call__(self, x):
        B, Hh, Ww, C = x.shape
        n = Hh * Ww
        ones = jnp.ones((Hh, Ww), x.dtype)
        s1 = jnp.einsum("bhwc,hw->bc", x, ones,
                        preferred_element_type=jnp.float32) / n
        s2 = jnp.einsum("bhwc,bhwc->bc", x, x,
                        preferred_element_type=jnp.float32) / n
        m = s1[:, None, None, :]
        var = jnp.maximum(s2 - jnp.square(s1), 0.0)[:, None, None, :]
        return finish(x, m, var, self.epsilon, self.dtype or x.dtype)


class NormBf16Stats(nn.Module):
    """Stats accumulated in the storage dtype (layout probe only —
    bf16 accumulation over 128K elements is numerically unacceptable)."""
    epsilon: float = 1e-5
    dtype: any = None

    @nn.compact
    def __call__(self, x):
        m = jnp.mean(x, axis=(1, 2), keepdims=True).astype(jnp.float32)
        m2 = jnp.mean(jnp.square(x), axis=(1, 2),
                      keepdims=True).astype(jnp.float32)
        var = jnp.maximum(m2 - jnp.square(m), 0.0)
        return finish(x, m, var, self.epsilon, self.dtype or x.dtype)


class NormTwoStage(nn.Module):
    """Reduce W first (small f32 intermediate), then H."""
    epsilon: float = 1e-5
    dtype: any = None

    @nn.compact
    def __call__(self, x):
        s1 = jnp.sum(x, axis=2, dtype=jnp.float32)   # (B, H, C)
        s2 = jnp.sum(jnp.square(x), axis=2, dtype=jnp.float32)
        n = x.shape[1] * x.shape[2]
        m = (jnp.sum(s1, axis=1) / n)[:, None, None, :]
        m2 = (jnp.sum(s2, axis=1) / n)[:, None, None, :]
        var = jnp.maximum(m2 - jnp.square(m), 0.0)
        return finish(x, m, var, self.epsilon, self.dtype or x.dtype)


class NormConcat(nn.Module):
    """One reduce over stacked [x, x^2] (single convert, single pass)."""
    epsilon: float = 1e-5
    dtype: any = None

    @nn.compact
    def __call__(self, x):
        both = jnp.stack([x, jnp.square(x)], axis=-1)  # (B,H,W,C,2)
        s = jnp.mean(both, axis=(1, 2), dtype=jnp.float32)  # (B,C,2)
        m = s[..., 0][:, None, None, :]
        m2 = s[..., 1][:, None, None, :]
        var = jnp.maximum(m2 - jnp.square(m), 0.0)
        return finish(x, m, var, self.epsilon, self.dtype or x.dtype)


def main():
    key = jax.random.PRNGKey(0)
    img4 = jnp.zeros((4, H, Wd, 3), jnp.float32)
    print(f"device: {jax.devices()[0]}  N={N}")

    variants = [
        ("current", L.InstanceNorm),
        ("einsum-mxu", NormEinsum),
        ("bf16-stats", NormBf16Stats),
        ("two-stage", NormTwoStage),
        ("concat", NormConcat),
    ]
    orig = L.InstanceNorm
    for name, cls in variants:
        L.InstanceNorm = cls
        try:
            enc = BasicEncoder(output_dim=256, norm_fn="instance",
                               dtype=jnp.bfloat16)
            v = enc.init(key, img4)

            def ebody(c, v, x):
                return enc.apply(v, x + c).astype(jnp.float32)
            timeit(f"fnet4 norm={name}", ebody, v, img4)
        finally:
            L.InstanceNorm = orig


if __name__ == "__main__":
    main()
