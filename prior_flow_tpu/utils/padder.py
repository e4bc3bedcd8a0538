"""Input padding to stride-8-compatible shapes + warm-start splatting.

Rebuild of ``InputPadder`` (core/utils/utils.py:7-27) for NHWC arrays:
replicate-edge padding to the next multiple of 8, 'sintel' mode centres the
pad, 'kitti' mode pads top only. ``forward_interpolate`` is the scipy
nearest-neighbour forward-splat used to warm-start sequential inference
(core/utils/utils.py:30-58).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class InputPadder:
    def __init__(self, dims, mode: str = "sintel", multiple: int = 8):
        self.ht, self.wd = dims[-3], dims[-2]  # NHWC
        m = multiple
        pad_ht = (((self.ht // m) + 1) * m - self.ht) % m
        pad_wd = (((self.wd // m) + 1) * m - self.wd) % m
        if mode == "sintel":
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2,
                         pad_ht // 2, pad_ht - pad_ht // 2]
        else:
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]

    def pad(self, *inputs):
        l, r, t, b = self._pad
        out = [jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge")
               for x in inputs]
        return out if len(out) > 1 else out[0]

    def unpad(self, x):
        ht, wd = x.shape[-3], x.shape[-2]
        l, r, t, b = self._pad
        return x[..., t:ht - b, l:wd - r, :]


def forward_interpolate(flow):
    """Forward-splat a flow field to the next frame (nearest-neighbour
    scattered interpolation) for sequence warm starting.

    flow: (H, W, 2) numpy/jax array -> (H, W, 2) numpy float32.
    Reference: ``forward_interpolate`` (core/utils/utils.py:30-58).
    """
    from scipy import interpolate as scipy_interpolate

    flow = np.asarray(flow)
    dx, dy = flow[..., 0], flow[..., 1]
    ht, wd = dx.shape
    x0, y0 = np.meshgrid(np.arange(wd), np.arange(ht))
    x1 = (x0 + dx).reshape(-1)
    y1 = (y0 + dy).reshape(-1)
    dxf = dx.reshape(-1)
    dyf = dy.reshape(-1)
    valid = (x1 > 0) & (x1 < wd) & (y1 > 0) & (y1 < ht)
    flow_x = scipy_interpolate.griddata(
        (x1[valid], y1[valid]), dxf[valid], (x0, y0), method="nearest",
        fill_value=0)
    flow_y = scipy_interpolate.griddata(
        (x1[valid], y1[valid]), dyf[valid], (x0, y0), method="nearest",
        fill_value=0)
    return np.stack([flow_x, flow_y], axis=-1).astype(np.float32)
