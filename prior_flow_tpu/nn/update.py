"""ConvGRU update blocks and motion encoders.

Rebuild of PriOr-RAFT/core/update.py in Flax/NHWC. Channel *orders* inside
every concatenation follow the reference exactly — that is what makes the
checkpoint conversion a pure layout transform.

- ``FlowHead``               (update.py:6-14)
- ``ConvGRU`` / ``SepConvGRU``(update.py:17-60)
- ``BasicMotionEncoder``     (update.py:81-99)
- ``BasicUpdateBlock``       (update.py:117-136)         — branch B
- ``BasicMultiMotionEncoder``(update.py:162-201)         — ODDC inputs
- ``BasicMultiUpdateBlock``  (update.py:139-159)         — ODDC (branch A)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .layers import conv

Dtype = Any


class FlowHead(nn.Module):
    hidden_dim: int = 256
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(conv(self.hidden_dim, 3, name="conv1", dtype=self.dtype)(x))
        return conv(2, 3, name="conv2", dtype=self.dtype)(x)


class ConvGRU(nn.Module):
    hidden_dim: int = 128
    dtype: Dtype = None

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(conv(self.hidden_dim, 3, name="convz", dtype=self.dtype)(hx))
        r = nn.sigmoid(conv(self.hidden_dim, 3, name="convr", dtype=self.dtype)(hx))
        q = nn.tanh(conv(self.hidden_dim, 3, name="convq", dtype=self.dtype)(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class SepConvGRU(nn.Module):
    """Two-pass GRU with (1,5) then (5,1) separable convs (update.py:35-60)."""

    hidden_dim: int = 128
    dtype: Dtype = None

    @nn.compact
    def __call__(self, h, x):
        # horizontal pass
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(conv(self.hidden_dim, (1, 5), padding=(0, 2),
                            name="convz1", dtype=self.dtype)(hx))
        r = nn.sigmoid(conv(self.hidden_dim, (1, 5), padding=(0, 2),
                            name="convr1", dtype=self.dtype)(hx))
        q = nn.tanh(conv(self.hidden_dim, (1, 5), padding=(0, 2),
                         name="convq1", dtype=self.dtype)(
            jnp.concatenate([r * h, x], axis=-1)))
        h = (1 - z) * h + z * q

        # vertical pass
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(conv(self.hidden_dim, (5, 1), padding=(2, 0),
                            name="convz2", dtype=self.dtype)(hx))
        r = nn.sigmoid(conv(self.hidden_dim, (5, 1), padding=(2, 0),
                            name="convr2", dtype=self.dtype)(hx))
        q = nn.tanh(conv(self.hidden_dim, (5, 1), padding=(2, 0),
                         name="convq2", dtype=self.dtype)(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class SmallMotionEncoder(nn.Module):
    """Legacy small motion encoder (update.py:63-78)."""

    corr_planes: int = 4 * 9 ** 2
    dtype: Dtype = None

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(conv(96, 1, padding=0, name="convc1", dtype=self.dtype)(corr))
        flo = nn.relu(conv(64, 7, padding=3, name="convf1", dtype=self.dtype)(flow))
        flo = nn.relu(conv(32, 3, name="convf2", dtype=self.dtype)(flo))
        out = nn.relu(conv(80, 3, name="conv", dtype=self.dtype)(
            jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class SmallUpdateBlock(nn.Module):
    """Legacy small update block (update.py:102-114): plain ConvGRU, no
    upsample mask."""

    hidden_dim: int = 96
    dtype: Dtype = None

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = SmallMotionEncoder(dtype=self.dtype, name="encoder")(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = ConvGRU(self.hidden_dim, dtype=self.dtype, name="gru")(net, x)
        delta_flow = FlowHead(128, dtype=self.dtype, name="flow_head")(net)
        return net, None, delta_flow


class BasicMotionEncoder(nn.Module):
    """{corr, flow} -> 128-channel motion feature (update.py:81-99)."""

    dtype: Dtype = None

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(conv(256, 1, padding=0, name="convc1", dtype=self.dtype)(corr))
        cor = nn.relu(conv(192, 3, name="convc2", dtype=self.dtype)(cor))
        flo = nn.relu(conv(128, 7, padding=3, name="convf1", dtype=self.dtype)(flow))
        flo = nn.relu(conv(64, 3, name="convf2", dtype=self.dtype)(flo))
        out = nn.relu(conv(126, 3, name="conv", dtype=self.dtype)(
            jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class BasicMultiMotionEncoder(nn.Module):
    """ODDC motion encoder fusing {corr_A, flow_A, flow_B->A, flaw_A,
    flaw_B->A} (update.py:162-201)."""

    dtype: Dtype = None

    @nn.compact
    def __call__(self, flow_A, corr_A, flaw_A, flow_B_A, flaw_B_A):
        cor_A = nn.relu(conv(256, 1, padding=0, name="convc1_A", dtype=self.dtype)(corr_A))
        cor_A = nn.relu(conv(128, 3, name="convc2_A", dtype=self.dtype)(cor_A))

        flo_A = nn.relu(conv(128, 7, padding=3, name="convf1_A", dtype=self.dtype)(flow_A))
        flo_A = nn.relu(conv(64, 3, name="convf2_A", dtype=self.dtype)(flo_A))

        flo_B = nn.relu(conv(128, 7, padding=3, name="convf1_B", dtype=self.dtype)(flow_B_A))
        flo_B = nn.relu(conv(64, 3, name="convf2_B", dtype=self.dtype)(flo_B))

        conf = nn.relu(conv(32, 3, name="conv_conf1", dtype=self.dtype)(
            jnp.concatenate([flaw_A, flaw_B_A], axis=-1)))
        conf = nn.relu(conv(16, 3, name="conv_conf2", dtype=self.dtype)(conf))

        out = nn.relu(conv(124, 3, name="conv_A", dtype=self.dtype)(
            jnp.concatenate([cor_A, flo_A, flo_B, conf], axis=-1)))
        return jnp.concatenate([out, flow_A, flow_B_A], axis=-1)


class BasicUpdateBlock(nn.Module):
    """Branch-B update: motion encoder -> SepConvGRU -> flow + mask heads
    (update.py:117-136)."""

    hidden_dim: int = 128
    dtype: Dtype = None

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(dtype=self.dtype, name="encoder")(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden_dim, dtype=self.dtype, name="gru")(net, x)
        delta_flow = FlowHead(256, dtype=self.dtype, name="flow_head")(net)
        mask = nn.relu(conv(256, 3, name="mask_0", dtype=self.dtype)(net))
        mask = conv(64 * 9, 1, padding=0, name="mask_2", dtype=self.dtype)(mask)
        return net, 0.25 * mask, delta_flow


class BasicMultiUpdateBlock(nn.Module):
    """ODDC (branch-A) update block (update.py:139-159)."""

    hidden_dim: int = 128
    dtype: Dtype = None

    @nn.compact
    def __call__(self, net, inp, flow_A, corr_A, flaw_A, flow_B_A, flaw_B_A):
        motion = BasicMultiMotionEncoder(dtype=self.dtype, name="encoder")(
            flow_A, corr_A, flaw_A, flow_B_A, flaw_B_A)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden_dim, dtype=self.dtype, name="gru")(net, x)
        delta_flow = FlowHead(256, dtype=self.dtype, name="flow_head")(net)
        mask = nn.relu(conv(256, 3, name="mask_0", dtype=self.dtype)(net))
        mask = conv(64 * 9, 1, padding=0, name="mask_2", dtype=self.dtype)(mask)
        return net, 0.25 * mask, delta_flow
