"""Flax building blocks shared by the encoders and update blocks.

Layout is NHWC (TPU-native). Submodule names deliberately mirror the
reference's PyTorch attribute names (conv1, norm1, layer1_0, ...) so the
checkpoint converter (checkpoint/convert.py) is a pure name/layout map.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def conv(features, kernel, stride=1, padding=None, name=None, dtype=None):
    """torch-style Conv2d: explicit zero padding, bias on, kernel (kh, kw)."""
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if padding is None:
        padding = (kernel[0] // 2, kernel[1] // 2)
    if isinstance(padding, int):
        padding = (padding, padding)
    return nn.Conv(
        features=features,
        kernel_size=kernel,
        strides=(stride, stride),
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
        use_bias=True,
        name=name,
        dtype=dtype,
        param_dtype=jnp.float32,
    )


def make_norm(kind: str, features: int, name: str,
              num_groups: Optional[int] = None,
              use_running_average: bool = True,
              dtype: Dtype = None):
    """Normalisation matching the reference's norm_fn choices
    (core/extractor.py:8-39, 98-128). Returns None for 'none'.

    - 'instance': torch InstanceNorm2d(affine=False) == per-channel,
      per-sample normalisation, no learnable params;
    - 'batch':    torch BatchNorm2d; the reference always freezes BN during
      the published training stages (core/prior_raft.py:43-48,
      train_flow.py:107-108), so running statistics are used unless
      ``use_running_average=False`` is explicitly requested;
    - 'group':    GroupNorm with C // 8 groups (ResidualBlock convention) or
      an explicit ``num_groups``;
    - 'none':     identity (None).
    """
    if kind == "none":
        return None
    if kind == "instance":
        return nn.GroupNorm(num_groups=None, group_size=1, use_bias=False,
                            use_scale=False, epsilon=1e-5, dtype=dtype,
                            name=name)
    if kind == "group":
        return nn.GroupNorm(num_groups=num_groups or features // 8,
                            epsilon=1e-5, dtype=dtype, name=name)
    if kind == "batch":
        return nn.BatchNorm(use_running_average=use_running_average,
                            epsilon=1e-5, momentum=0.9, dtype=dtype,
                            name=name)
    raise ValueError(f"unknown norm kind {kind!r}")


def apply_norm(norm, x):
    return x if norm is None else norm(x)
