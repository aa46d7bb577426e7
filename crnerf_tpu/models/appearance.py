"""Appearance (style) encoders.

``AppearanceEncoder`` is the live model (reference ``encoder_sameoutputsize``,
/root/reference/models/linearStyleTransfer.py:208-276): a small VGG-ish conv
stack over the whole (downscaled, [0,1]-ranged) image with two maxpools, an
adaptive average pool to 32x32, and a 1x1 projection to ``out_channel``
channels — producing the (1, 32, 32, C) style embedding used both as the
style source (enc_a) and the content-constraint encoder (enc_cont).

``Encoder3``/``Decoder3`` are the legacy linear-style-transfer pair
(linearStyleTransfer.py:97-206), kept for zoo parity.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from crnerf_tpu.models.common import (
    ConvRefl,
    _d2s,
    _s2d,
    adaptive_avg_pool2d,
    leaky_relu,
    max_pool_2x2,
    packed_max_pool,
    reflect_pad,
)


class AppearanceEncoder(nn.Module):
    out_channel: int = 64
    pool_hw: int = 32
    dtype: jnp.dtype = jnp.float32  # conv compute dtype (params stay fp32)
    s2d: bool = False  # space-to-depth schedule for the wide 3x3 convs
    # (identical math/params — see models/common.py s2d_conv3x3)
    s2d_stack: bool = False  # WHOLE-STACK space-to-depth: pack once per
    # pyramid level, keep conv2..conv6 in packed space (halos via
    # packed_reflect_pad1) and let each 2x2 maxpool unpack for free as a
    # cross-phase max. Identical math/params to the plain schedule
    # (tests/test_models.py pins it); kills the per-conv repack traffic
    # that sank the per-conv s2d A/B (BASELINE.md 2026-08-19, -3.7%).

    @nn.compact
    def __call__(self, x):
        """x: (N, H, W, 3) in [0, 1] -> (N, 32, 32, out_channel)."""
        dt = self.dtype
        if self.s2d_stack and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0:
            x = nn.Conv(3, (1, 1), name="conv1", dtype=dt)(x)
            xp = _s2d(x)
            xp = leaky_relu(ConvRefl(64, name="conv2", dtype=dt,
                                     packed=True)(xp))
            xp = leaky_relu(ConvRefl(64, name="conv3", dtype=dt,
                                     packed=True)(xp))
            xp = _s2d(packed_max_pool(xp))
            xp = leaky_relu(ConvRefl(128, name="conv4", dtype=dt,
                                     packed=True)(xp))
            xp = leaky_relu(ConvRefl(128, name="conv5", dtype=dt,
                                     packed=True)(xp))
            x = packed_max_pool(xp)
            if x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
                xp = _s2d(x)
                x = _d2s(ConvRefl(128, name="conv6", dtype=dt,
                                  packed=True)(xp))
                x = leaky_relu(x)
            else:
                x = leaky_relu(ConvRefl(128, name="conv6", dtype=dt)(x))
            x = adaptive_avg_pool2d(x, (self.pool_hw, self.pool_hw))
            x = nn.Conv(self.out_channel, (1, 1), name="conv7", dtype=dt)(x)
            return leaky_relu(x).astype(jnp.float32)
        sd = self.s2d
        x = nn.Conv(3, (1, 1), name="conv1", dtype=dt)(x)
        x = leaky_relu(ConvRefl(64, name="conv2", dtype=dt)(x))
        x = leaky_relu(ConvRefl(64, name="conv3", dtype=dt, s2d=sd)(x))
        x = max_pool_2x2(x)
        x = leaky_relu(ConvRefl(128, name="conv4", dtype=dt, s2d=sd)(x))
        x = leaky_relu(ConvRefl(128, name="conv5", dtype=dt, s2d=sd)(x))
        x = max_pool_2x2(x)
        x = leaky_relu(ConvRefl(128, name="conv6", dtype=dt, s2d=sd)(x))
        x = adaptive_avg_pool2d(x, (self.pool_hw, self.pool_hw))
        x = nn.Conv(self.out_channel, (1, 1), name="conv7", dtype=dt)(x)
        return leaky_relu(x).astype(jnp.float32)


class Encoder3(nn.Module):
    """Legacy VGG-style encoder (linearStyleTransfer.py:149-206)."""

    out_channel: int = 64

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(3, (1, 1), name="conv1")(x)
        x = leaky_relu(ConvRefl(64, name="conv2")(x))
        x = leaky_relu(ConvRefl(64, name="conv3")(x))
        x = max_pool_2x2(x)
        x = leaky_relu(ConvRefl(128, name="conv4")(x))
        x = leaky_relu(ConvRefl(128, name="conv5")(x))
        x = max_pool_2x2(x)
        x = leaky_relu(ConvRefl(self.out_channel, name="conv6")(x))
        return x


class Decoder3(nn.Module):
    """Legacy decoder (linearStyleTransfer.py:97-146): two nearest-neighbor
    2x upsamples with 3x3 reflection-padded convs."""

    in_channel: int = 64

    @nn.compact
    def __call__(self, x):
        def up2(x):
            n, h, w, c = x.shape
            return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

        x = nn.relu(ConvRefl(128, name="conv7")(x))
        x = up2(x)
        x = nn.relu(ConvRefl(128, name="conv8")(x))
        x = nn.relu(ConvRefl(64, name="conv9")(x))
        x = up2(x)
        x = nn.relu(ConvRefl(64, name="conv10")(x))
        return ConvRefl(3, name="conv11")(x)
