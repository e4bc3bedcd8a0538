"""Single-branch RAFT: the perspective-image model family.

The reference keeps upstream RAFT's components alive (BasicEncoder /
BasicUpdateBlock / CorrBlock, core/extractor.py, core/update.py:117-136,
core/corr.py:13-61) and its perspective datasets + validators
(core/datasets.py:351-446, evaluate.py:77-169). This module provides the
matching model so those paths are exercisable end to end: a standard
(non-spherical) RAFT with the plain (no-wrap) correlation lookup.

Checkpoint compatibility: upstream RAFT ``raft-things.pth`` state dicts load
via checkpoint.convert_state_dict against this model's template (same
layer names: fnet/cnet/update_block).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import grids as gridlib
from ..nn.encoder import BasicEncoder, SmallEncoder
from ..nn.update import BasicUpdateBlock, SmallUpdateBlock
from ..ops.corr import all_pairs_correlation, build_pyramid, _window_delta
from ..ops.samplers import bilinear_sample
from .prior_raft import upsample_flow_convex


def corr_block_lookup(pyramid, coords, radius: int = 4):
    """Upstream-RAFT correlation lookup: per level, a (2r+1)^2 window around
    the (level-scaled) coords, bilinear WITHOUT x-wrap (zero padding on all
    sides) — core/corr.py:30-51.

    pyramid: tuple of (B, Q, Hl, Wl); coords: (B, h, w, 2).
    Returns (B, h, w, L*(2r+1)^2).
    """
    B, h, w, _ = coords.shape
    Q = h * w
    delta = jnp.asarray(_window_delta(radius))[None, None]  # (1, 1, K, 2)
    cq = coords.reshape(B, Q, 1, 2)
    out = []
    for i, vol in enumerate(pyramid):
        coords_lvl = cq / (2.0 ** i) + delta  # (B, Q, K, 2)
        Hl, Wl = vol.shape[2], vol.shape[3]
        img = vol.reshape(B * Q, Hl, Wl, 1)
        K = coords_lvl.shape[2]
        samp = bilinear_sample(img, coords_lvl.reshape(B * Q, K, 2))
        out.append(samp.reshape(B, h, w, K))
    return jnp.concatenate(out, axis=-1)


class RAFT(nn.Module):
    """Standard RAFT (upstream architecture), NHWC/scan TPU build."""

    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    dropout: float = 0.0
    mixed_precision: bool = False
    small: bool = False
    bn_running_average: bool = True
    precision: Optional[str] = None

    def setup(self):
        dtype = jnp.bfloat16 if self.mixed_precision else None
        if self.small:
            self.fnet = SmallEncoder(output_dim=128, norm_fn="instance",
                                     dropout=self.dropout, dtype=dtype)
            self.cnet = SmallEncoder(output_dim=96 + 64, norm_fn="none",
                                     dropout=self.dropout, dtype=dtype)
            self.update_block = SmallUpdateBlock(hidden_dim=96, dtype=dtype)
        else:
            self.fnet = BasicEncoder(output_dim=256, norm_fn="instance",
                                     dropout=self.dropout, dtype=dtype)
            self.cnet = BasicEncoder(
                output_dim=self.hidden_dim + self.context_dim,
                norm_fn="batch", dropout=self.dropout,
                use_running_average=self.bn_running_average, dtype=dtype)
            self.update_block = BasicUpdateBlock(hidden_dim=self.hidden_dim,
                                                 dtype=dtype)

    def _step(self, carry, consts):
        net, coords1 = carry
        inp, pyramid, coords0 = consts
        coords1 = jax.lax.stop_gradient(coords1)
        flow = coords1 - coords0
        corr = corr_block_lookup(pyramid, coords1, self.corr_radius)
        net, up_mask, delta_flow = self.update_block(net, inp, corr, flow)
        coords1 = coords1 + delta_flow
        flow_down = coords1 - coords0
        if up_mask is None:
            from ..ops.warp import upflow8
            flow_up = upflow8(flow_down)
        else:
            flow_up = upsample_flow_convex(flow_down, up_mask)
        return (net, coords1), flow_up

    def __call__(self, image1, image2, iters: int = 12,
                 init_flow: Optional[jnp.ndarray] = None,
                 test_mode: bool = False, train: bool = False):
        if self.precision is not None:
            with jax.default_matmul_precision(self.precision):
                return self._forward(image1, image2, iters, init_flow,
                                     test_mode, train)
        return self._forward(image1, image2, iters, init_flow, test_mode,
                             train)

    def _forward(self, image1, image2, iters, init_flow, test_mode, train):
        B, H, W, _ = image1.shape
        hdim = 96 if self.small else self.hidden_dim
        cdim = 64 if self.small else self.context_dim

        image1 = 2.0 * (image1 / 255.0) - 1.0
        image2 = 2.0 * (image2 / 255.0) - 1.0

        cnet = self.cnet(image1, train=train)
        net = jnp.tanh(cnet[..., :hdim])
        inp = nn.relu(cnet[..., hdim:])

        fmap1, fmap2 = self.fnet([image1, image2], train=train)
        fmap1 = fmap1.astype(jnp.float32)
        fmap2 = fmap2.astype(jnp.float32)
        pyramid = tuple(build_pyramid(all_pairs_correlation(fmap1, fmap2),
                                      self.corr_levels))

        h8, w8 = H // 8, W // 8
        coords0 = jnp.broadcast_to(
            jnp.asarray(gridlib.identity_grid(h8, w8))[None], (B, h8, w8, 2))
        coords1 = coords0 if init_flow is None else coords0 + init_flow

        scan = nn.scan(
            RAFT._step,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=nn.broadcast,
            out_axes=0,
            length=iters,
        )
        _, preds = scan(self, (net, coords1), (inp, pyramid, coords0))
        if test_mode:
            return preds[-1]
        return preds
