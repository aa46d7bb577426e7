"""Legacy NeRF-W-era modules kept for zoo parity
(/root/reference/models/networks.py:9-50): ``E_attr`` (attribute encoder,
imported by the reference eval.py but unused) and ``implicit_mask`` (the MLP
mask superseded by CGNet)."""

from __future__ import annotations

from flax import linen as nn

from crnerf_tpu.models.common import global_avg_pool, reflect_pad


class EAttr(nn.Module):
    """Reflection-padded conv pyramid -> global pool -> output_nc vector."""

    output_nc: int = 8

    @nn.compact
    def __call__(self, x):
        dim = 64
        x = reflect_pad(x, 3)
        x = nn.relu(nn.Conv(dim, (7, 7), padding="VALID")(x))
        for feats in (dim * 2, dim * 4, dim * 4, dim * 4):
            x = reflect_pad(x, 1)
            x = nn.relu(
                nn.Conv(feats, (4, 4), strides=(2, 2), padding="VALID")(x)
            )
        x = global_avg_pool(x)[:, None, None, :]
        x = nn.Conv(self.output_nc, (1, 1))(x)
        return x.reshape(x.shape[0], -1)


class ImplicitMask(nn.Module):
    """4x256 ReLU MLP + sigmoid over [latent, dir-embedding] inputs."""

    width: int = 256

    @nn.compact
    def __call__(self, x):
        for i in range(4):
            x = nn.relu(nn.Dense(self.width, name=f"fc{i}")(x))
        return nn.sigmoid(nn.Dense(1, name="out")(x))
