"""Conv decoders mapping fused 64-ch feature maps to RGB.

Reference: ``NeuralRenderer`` and friends
(/root/reference/models/nerf_decoder_stylenerf.py:105-291,452-458). In the
shipped CR-NeRF config img_size == featmap_size so n_blocks = log2(1) = 0 and
the decoder degenerates to one 1x1 conv + sigmoid
(nerf_decoder_stylenerf.py:239,280,289-291). The progressive-upsampling path
(PixelShuffleUpsample + Blur + per-block 1x1 convs) is implemented for
n_blocks > 0; note the reference's own ``NeuralRenderer.forward`` would hit
an undefined ``net`` there (SURVEY.md §2.8) — we implement the working
variant's dataflow (``NeuralRenderer_11.forward``,
nerf_decoder_stylenerf.py:201-222) which initializes net = x.

``final_act='tanh01'`` mirrors ``NeuralRenderer_11_tanh`` / model_mode
'1-4-1' ((tanh(x)+1)/2 output).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from crnerf_tpu.models.common import leaky_relu, pixel_shuffle, resize_bilinear


class Blur(nn.Module):
    """kornia filter2d with the normalized [1,2,1] outer-product kernel and
    reflect border (nerf_decoder_stylenerf.py:105-115)."""

    @nn.compact
    def __call__(self, x):
        import jax

        f = jnp.array([1.0, 2.0, 1.0])
        k = ((f[:, None] * f[None, :]) / 16.0).astype(x.dtype)
        c = x.shape[-1]
        xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        kernel = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
        return jax.lax.conv_general_dilated(
            xpad, kernel,
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )


class PixelShuffleUpsample(nn.Module):
    """2x upsample: two 1x1 convs to 4C with a tiled residual, pixel shuffle,
    blur (nerf_decoder_stylenerf.py:118-142)."""

    in_feature: int

    @nn.compact
    def __call__(self, x):
        y = jnp.tile(x, (1, 1, 1, 4))
        out = leaky_relu(nn.Conv(self.in_feature * 2, (1, 1), name="layer_1")(x))
        out = leaky_relu(nn.Conv(self.in_feature * 4, (1, 1), name="layer_2")(out))
        out = out + y
        out = pixel_shuffle(out, 2)
        return Blur(name="blur")(out)


class NeuralRenderer(nn.Module):
    feat_nc: int = 64
    out_dim: int = 3
    n_blocks: int = 0
    min_feat: int = 32
    final_act: str = "sigmoid"  # 'sigmoid' | 'tanh01' | 'none'
    dtype: jnp.dtype = jnp.float32

    def _feat(self, i: int) -> int:
        return max(self.feat_nc // (2 ** i), self.min_feat)

    @nn.compact
    def __call__(self, x):
        """x: (N, H, W, feat_nc) -> (N, H * 2^n_blocks, W * 2^n_blocks, 3)."""
        rgb = nn.Conv(self.out_dim, (1, 1), name="feat_2_rgb_0",
                      dtype=self.dtype)(x)
        net = x
        for i in range(self.n_blocks):
            up = PixelShuffleUpsample(self._feat(i), name=f"upsample_{i}")(net)
            hid = nn.Conv(self._feat(i + 1), (1, 1), name=f"feat_{i}")(up)
            net = leaky_relu(hid)
            if i == 0:
                # first rgb must be brought to the upsampled resolution
                rgb = Blur(name="rgb_blur_0")(
                    resize_bilinear(rgb, net.shape[1:3])
                )
            rgb = rgb + nn.Conv(
                self.out_dim, (1, 1), name=f"feat_2_rgb_{i + 1}"
            )(net)
            if i < self.n_blocks - 1:
                rgb = Blur(name=f"rgb_blur_{i + 1}")(
                    resize_bilinear(rgb, (rgb.shape[1] * 2, rgb.shape[2] * 2))
                )
        rgb = rgb.astype(jnp.float32)
        if self.final_act == "sigmoid":
            return nn.sigmoid(rgb)
        if self.final_act == "tanh01":
            return (jnp.tanh(rgb) + 1.0) / 2.0
        return rgb


def get_renderer(nerf_out_dim: int = 64, model_mode: str = "1-1",
                 n_blocks: int = 0) -> NeuralRenderer:
    """Decoder factory (reference ``get_renderer``,
    nerf_decoder_stylenerf.py:452-458). Used when encode_a is off."""
    if model_mode == "1-1":
        return NeuralRenderer(feat_nc=nerf_out_dim, out_dim=3,
                              n_blocks=n_blocks)
    if model_mode == "1-4-1":
        return NeuralRenderer(feat_nc=nerf_out_dim, out_dim=3,
                              n_blocks=n_blocks, final_act="tanh01")
    raise ValueError(f"unknown model_mode {model_mode!r}")
