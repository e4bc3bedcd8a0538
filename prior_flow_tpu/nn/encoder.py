"""Feature / context CNN encoders.

Rebuild of the reference encoders (PriOr-RAFT/core/extractor.py) in Flax,
NHWC, with the same topology so converted checkpoints map 1:1:

- ``BasicEncoder`` (extractor.py:98-158): 7x7/2 stem -> 3 stages of two
  ResidualBlocks (64, 96/2, 128/2) -> 1x1 head. Overall stride 8.
- ``ResidualBlock`` (extractor.py:8-47): two 3x3 convs + optional strided
  1x1 downsample; per-block norms norm1/norm2/norm3.
- Legacy ``SmallEncoder``/``BottleneckBlock`` (extractor.py:50-96, 160-216)
  kept for API parity with upstream-RAFT configurations.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import apply_norm, conv, make_norm


class ResidualBlock(nn.Module):
    in_planes: int
    planes: int
    norm_fn: str = "group"
    stride: int = 1
    use_running_average: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kw = dict(use_running_average=self.use_running_average,
                  dtype=self.dtype)
        y = conv(self.planes, 3, stride=self.stride, name="conv1",
                 dtype=self.dtype)(x)
        y = nn.relu(apply_norm(make_norm(self.norm_fn, self.planes, "norm1", **kw), y))
        y = conv(self.planes, 3, name="conv2", dtype=self.dtype)(y)
        y = nn.relu(apply_norm(make_norm(self.norm_fn, self.planes, "norm2", **kw), y))
        if self.stride != 1:
            x = conv(self.planes, 1, stride=self.stride, padding=0,
                     name="downsample_0", dtype=self.dtype)(x)
            x = apply_norm(make_norm(self.norm_fn, self.planes, "norm3", **kw), x)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    """Legacy 1-3-1 bottleneck (extractor.py:50-96)."""

    in_planes: int
    planes: int
    norm_fn: str = "group"
    stride: int = 1
    use_running_average: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kw = dict(use_running_average=self.use_running_average,
                  dtype=self.dtype)
        q = self.planes // 4
        y = conv(q, 1, padding=0, name="conv1", dtype=self.dtype)(x)
        y = nn.relu(apply_norm(make_norm(self.norm_fn, q, "norm1", num_groups=self.planes // 8, **kw), y))
        y = conv(q, 3, stride=self.stride, name="conv2", dtype=self.dtype)(y)
        y = nn.relu(apply_norm(make_norm(self.norm_fn, q, "norm2", num_groups=self.planes // 8, **kw), y))
        y = conv(self.planes, 1, padding=0, name="conv3", dtype=self.dtype)(y)
        y = nn.relu(apply_norm(make_norm(self.norm_fn, self.planes, "norm3", **kw), y))
        if self.stride != 1:
            x = conv(self.planes, 1, stride=self.stride, padding=0,
                     name="downsample_0", dtype=self.dtype)(x)
            x = apply_norm(make_norm(self.norm_fn, self.planes, "norm4", **kw), x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """3-stage residual encoder, stride 8 (extractor.py:98-158).

    Input (B, H, W, 3) -> output (B, H/8, W/8, output_dim). A list/tuple of
    inputs is concatenated on the batch axis, encoded in one pass, and split
    back — same batching trick as the reference (extractor.py:139-158).
    """

    output_dim: int = 128
    norm_fn: str = "batch"
    dropout: float = 0.0
    use_running_average: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        is_list = isinstance(x, (tuple, list))
        if is_list:
            batch_dim = x[0].shape[0]
            x = jnp.concatenate(x, axis=0)

        kw = dict(use_running_average=self.use_running_average,
                  dtype=self.dtype)
        x = conv(64, 7, stride=2, padding=3, name="conv1", dtype=self.dtype)(x)
        x = nn.relu(apply_norm(
            make_norm(self.norm_fn, 64, "norm1", num_groups=8, **kw), x))

        planes = [(64, 64, 1), (64, 96, 2), (96, 128, 2)]
        for stage, (inp, out, stride) in enumerate(planes, start=1):
            x = ResidualBlock(inp, out, self.norm_fn, stride=stride,
                              use_running_average=self.use_running_average,
                              dtype=self.dtype, name=f"layer{stage}_0")(x)
            x = ResidualBlock(out, out, self.norm_fn, stride=1,
                              use_running_average=self.use_running_average,
                              dtype=self.dtype, name=f"layer{stage}_1")(x)

        x = conv(self.output_dim, 1, padding=0, name="conv2",
                 dtype=self.dtype)(x)

        if train and self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=False)(x)

        if is_list:
            n = x.shape[0] // batch_dim
            return tuple(x[i * batch_dim:(i + 1) * batch_dim] for i in range(n))
        return x


class SmallEncoder(nn.Module):
    """Legacy small encoder (extractor.py:160-216)."""

    output_dim: int = 128
    norm_fn: str = "batch"
    dropout: float = 0.0
    use_running_average: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        is_list = isinstance(x, (tuple, list))
        if is_list:
            batch_dim = x[0].shape[0]
            x = jnp.concatenate(x, axis=0)

        kw = dict(use_running_average=self.use_running_average,
                  dtype=self.dtype)
        x = conv(32, 7, stride=2, padding=3, name="conv1", dtype=self.dtype)(x)
        x = nn.relu(apply_norm(
            make_norm(self.norm_fn, 32, "norm1", num_groups=8, **kw), x))

        planes = [(32, 32, 1), (32, 64, 2), (64, 96, 2)]
        for stage, (inp, out, stride) in enumerate(planes, start=1):
            x = BottleneckBlock(inp, out, self.norm_fn, stride=stride,
                                use_running_average=self.use_running_average,
                                dtype=self.dtype, name=f"layer{stage}_0")(x)
            x = BottleneckBlock(out, out, self.norm_fn, stride=1,
                                use_running_average=self.use_running_average,
                                dtype=self.dtype, name=f"layer{stage}_1")(x)

        x = conv(self.output_dim, 1, padding=0, name="conv2",
                 dtype=self.dtype)(x)
        if train and self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=False)(x)
        if is_list:
            n = x.shape[0] // batch_dim
            return tuple(x[i * batch_dim:(i + 1) * batch_dim] for i in range(n))
        return x
