"""Latitude-weighted sequence loss for dual-branch RAFT training.

Rebuild of ``uniform_loss`` (train_flow.py:55-79): per-iteration L1 loss
weighted by gamma^(N-i-1), each pixel weighted by a normalised cos-latitude
mask, pixels masked by validity AND ||gt|| < max_flow; the loss is a SUM
over pixels (not a mean) — preserving the reference's gradient scale.

Metrics reported per call: epe / 1px / 3px / 5px rates over valid pixels of
the final prediction (train_flow.py:71-78).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..eval.metrics import spherical_mask

MAX_FLOW = 400.0  # exclude extreme displacements (train_flow.py:46)


def uniform_sequence_loss(flow_preds, flow_gt, valid, gamma: float = 0.8,
                          max_flow: float = MAX_FLOW, prefix: str = ""):
    """flow_preds: (iters, B, H, W, 2) stacked predictions;
    flow_gt: (B, H, W, 2); valid: (B, H, W).

    Returns (loss, metrics-dict). Metrics are jnp scalars (host-convert at
    the logging boundary).
    """
    n_predictions, B, H, W, _ = flow_preds.shape
    weights_mask = jnp.asarray(spherical_mask(H, W))[None]  # (1, H, W)

    mag = jnp.sqrt(jnp.sum(flow_gt ** 2, axis=-1))
    valid = (valid >= 0.5) & (mag < max_flow)  # (B, H, W)

    i = jnp.arange(n_predictions, dtype=flow_preds.dtype)
    i_weights = gamma ** (n_predictions - i - 1.0)  # (iters,)

    abs_err = jnp.sum(jnp.abs(flow_preds - flow_gt[None]), axis=-1)  # (it,B,H,W)
    per_iter = jnp.sum(abs_err * (valid * weights_mask)[None], axis=(1, 2, 3))
    loss = jnp.sum(i_weights * per_iter)

    err = jnp.sqrt(jnp.sum((flow_preds[-1] - flow_gt) ** 2, axis=-1))
    denom = jnp.maximum(jnp.sum(valid), 1)
    vepe = jnp.where(valid, err, 0.0)
    metrics = {
        prefix + "epe": jnp.sum(vepe) / denom,
        prefix + "1px": jnp.sum((err < 1) & valid) / denom,
        prefix + "3px": jnp.sum((err < 3) & valid) / denom,
        prefix + "5px": jnp.sum((err < 5) & valid) / denom,
    }
    return loss, metrics
