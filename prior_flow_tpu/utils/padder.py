"""Input padding to stride-8-compatible shapes.

Rebuild of ``InputPadder`` (core/utils/utils.py:7-27) for NHWC arrays:
replicate-edge padding to the next multiple of 8, 'sintel' mode centres the
pad, 'kitti' mode pads top only.
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
