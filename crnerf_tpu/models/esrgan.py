"""ESRGAN-style RRDB decoder, an alternative feature-map-to-RGB decoder in
the reference zoo (/root/reference/models/esrgan.py:18-90; imported by the
reference trainer but not used in the shipped config). 1x1-conv dense
residual blocks with 0.2 residual scaling; output (tanh+1)/2."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from crnerf_tpu.models.common import leaky_relu


class DenseResidualBlock(nn.Module):
    filters: int
    res_scale: float = 0.2

    @nn.compact
    def __call__(self, x):
        inputs = x
        out = x
        for i in range(5):
            out = nn.Conv(self.filters, (1, 1), name=f"b{i + 1}")(inputs)
            if i < 4:
                out = leaky_relu(out)
            inputs = jnp.concatenate([inputs, out], -1)
        return out * self.res_scale + x


class ResidualInResidualDenseBlock(nn.Module):
    filters: int
    res_scale: float = 0.2

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(3):
            h = DenseResidualBlock(self.filters, name=f"dense_{i}")(h)
        return h * self.res_scale + x


class RRDBNet(nn.Module):
    """Reference ``GeneratorRRDB`` (esrgan.py:60-90)."""

    channels: int = 64
    filters: int = 64
    num_res_blocks: int = 2

    @nn.compact
    def __call__(self, x):
        out1 = nn.Conv(self.filters, (1, 1), name="conv1")(x)
        h = out1
        for i in range(self.num_res_blocks):
            h = ResidualInResidualDenseBlock(self.filters, name=f"rrdb_{i}")(h)
        out2 = nn.Conv(self.filters, (1, 1), name="conv2")(h)
        h = out1 + out2
        h = leaky_relu(nn.Conv(self.filters, (1, 1), name="conv3_0")(h))
        h = nn.Conv(3, (1, 1), name="conv3_1")(h)
        return (jnp.tanh(h) + 1.0) / 2.0
