"""Fused Pallas TPU instance normalisation (torch InstanceNorm2d,
affine=False — reference core/extractor.py:14-20 'instance' norm_fn).

Why a kernel: between convolutions, XLA materialises the activation in a
reduce-friendly layout AND back for every spatial-stats normalisation —
measured 2.7 GB of pure relayout copies per fnet forward at 4x512x1024
(~18 ms of a 25 ms encoder; tools/microbench_norm_variants.py shows every
jnp stats formulation compiles to the same copies).

Structure: only the REDUCTIONS run in Pallas — per-(B, lane-slot) sums of
x and x*x streamed over a full-128-lane view of the activation (channels
tiled across lanes when 128 % C == 0, so C=64 encoders still fill the
VPU). Everything elementwise (the normalisation affine, and the whole
backward apart from its two sums) stays in XLA, where it fuses with the
neighbouring relu/conv epilogues for free. Statistics accumulate in f32.

Backward (affine-free instance norm):

    dx = s * (dy - mean(dy) - xhat * mean(dy * xhat)),  s = rsqrt(var+eps)

which only needs sums of dy and dy*x (sum(dy*xhat) = s*sum(dy*x) +
shift*sum(dy)) — the same kernel shape. Gradients are exact (f32
accumulation) and deterministic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _pick_rows(n_rows: int, max_rows: int = 2048):
    """Largest divisor row-tile <= max_rows (keeps blocks small enough for
    DMA double-buffering to overlap the VPU)."""
    best = 1
    d = 1
    while d * d <= n_rows:
        if n_rows % d == 0:
            for t in (d, n_rows // d):
                if t <= max_rows and t > best:
                    best = t
        d += 1
    return best


def _sums_kernel(x_ref, y_ref, s1_ref, s2_ref):
    """Accumulate per-lane sums of x and x*y over row tiles (y = x for the
    forward moments; y = dy for the backward)."""
    r = pl.program_id(1)
    xf = x_ref[0].astype(jnp.float32)
    yf = y_ref[0].astype(jnp.float32)
    s1 = jnp.sum(yf, axis=0, keepdims=True)
    s2 = jnp.sum(xf * yf, axis=0, keepdims=True)

    @pl.when(r == 0)
    def _init():
        s1_ref[...] = s1[None]
        s2_ref[...] = s2[None]

    @pl.when(r != 0)
    def _acc():
        s1_ref[...] += s1[None]
        s2_ref[...] += s2[None]


def _lane_sums(x3, y3, interpret):
    """(B, nr, S) x2 -> per-lane f32 sums (B, 1, S) of y and x*y."""
    B, nr, S = x3.shape
    tr = _pick_rows(nr)
    row = lambda b, r: (b, r, 0)
    stat = lambda b, r: (b, 0, 0)
    return pl.pallas_call(
        _sums_kernel,
        grid=(B, nr // tr),
        in_specs=[pl.BlockSpec((1, tr, S), row, memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tr, S), row, memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, 1, S), stat, memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, S), stat, memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, 1, S), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, S), jnp.float32)),
        interpret=interpret,
    )(x3, y3)


def _slot_view(x):
    """(B, H, W, C) -> (B, nr, S) full-lane view plus a slot->channel fold.

    When 128 % C == 0 consecutive spatial rows are tiled across the lane
    axis (slot s holds channel s % C), so C=64 activations still use all
    128 lanes; the fold sums the 128//C slot groups back to channels.
    """
    B, H, W, C = x.shape
    n = H * W
    if C < LANES and LANES % C == 0 and (n * C) % LANES == 0:
        g = LANES // C
        x3 = x.reshape(B, n * C // LANES, LANES)
        fold = lambda s: s.reshape(B, g, C).sum(axis=1)
        unfold = lambda v: jnp.tile(v, (1, g))  # (B, C) -> (B, S)
        return x3, fold, unfold
    x3 = x.reshape(B, n, C)
    ident = lambda s: s.reshape(B, C)
    return x3, ident, ident


def _moments(x, eps, interpret):
    """Per-(B, C) f32 (mean, rsqrt(var + eps)) via the Pallas sums."""
    B, H, W, C = x.shape
    n = H * W
    x3, fold, _ = _slot_view(x)
    s1, s2 = _lane_sums(x3, x3, interpret)
    m = fold(s1) / n
    var = jnp.maximum(fold(s2) / n - m * m, 0.0)
    return m, jax.lax.rsqrt(var + eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def instance_norm_fused(x, eps: float = 1e-5, out_dtype=None,
                        interpret: bool = False):
    """Per-sample per-channel normalisation of (B, H, W, C), affine-free.

    Matches the jnp reference formula to f32 accuracy (statistics and the
    normalisation affine in f32; only the output rounds to ``out_dtype``
    or x.dtype).
    """
    y, _ = _fwd(x, eps, out_dtype, interpret)
    return y


def _fwd(x, eps, out_dtype, interpret):
    m, s = _moments(x, eps, interpret)
    a = s[:, None, None, :]
    b = (-m * s)[:, None, None, :]
    y = (x.astype(jnp.float32) * a + b).astype(out_dtype or x.dtype)
    return y, (x, m, s)


def _bwd(eps, out_dtype, interpret, res, dy):
    x, m, s = res
    B, H, W, C = x.shape
    n = H * W
    x3, fold, _ = _slot_view(x)
    dy3 = dy.reshape(x3.shape)
    d1, d2 = _lane_sums(x3, dy3, interpret)
    mdy = (fold(d1) / n)[:, None, None, :]
    # mean(dy * xhat) = s * mean(dy*x) - s * m * mean(dy)
    mdyx = (s * (fold(d2) / n))[:, None, None, :] \
        - (s * m)[:, None, None, :] * mdy
    a = s[:, None, None, :]
    xhat = (x.astype(jnp.float32) - m[:, None, None, :]) * a
    dx = a * (dy.astype(jnp.float32) - mdy - xhat * mdyx)
    return (dx.astype(x.dtype),)


instance_norm_fused.defvjp(_fwd, _bwd)
