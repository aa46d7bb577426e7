"""The cross-ray style transformation head.

Reference: ``CNN`` + ``MulLayer`` + ``style_net``
(/root/reference/models/linearStyleTransfer.py:6-94,278-291) — the
linear-style-transfer fusion that is the paper's "cross-ray appearance
transfer": both the rendered feature map (content) and the style embedding
are mean-centered, compressed to matrixSize channels, turned into gram-like
32x32 matrices by small conv towers, multiplied into one transformation
matrix, applied to the compressed content, unzipped back to 64 channels, and
shifted by the style mean.

Everything here is batched matmuls on 32x32/32xHW operands — pure MXU food.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from crnerf_tpu.models.common import leaky_relu
from crnerf_tpu.models.decoder import NeuralRenderer


class GramCNN(nn.Module):
    """Conv tower + gram matrix + FC (reference ``CNN``,
    linearStyleTransfer.py:6-37). Input NHWC, output (N, m*m)."""

    matrix_size: int = 32
    in_channel: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid_mask=None, n_valid=None):
        """``valid_mask`` (N, H, W, 1) 0/1 with traced pixel count
        ``n_valid``: gram statistics over the valid pixels only — exact
        for arbitrarily padded maps since the tower is all 1x1 convs
        (resolution bucketing, SURVEY.md §7 hard part 1)."""
        n, h, w, _ = x.shape
        dt = self.dtype
        x = leaky_relu(nn.Conv(128, (1, 1), name="conv1", dtype=dt)(x))
        x = leaky_relu(nn.Conv(64, (1, 1), name="conv2", dtype=dt)(x))
        x = nn.Conv(self.matrix_size, (1, 1), name="conv3", dtype=dt)(x)
        x = x.astype(jnp.float32)  # gram + fc in fp32 (transmatrix quality)
        if valid_mask is not None:
            x = x * valid_mask
            denom = n_valid
        else:
            denom = h * w
        # gram: (N, C, HW) @ (N, HW, C) / n_pixels
        flat = x.reshape(n, h * w, self.matrix_size)
        gram = jnp.einsum(
            "npc,npd->ncd", flat, flat,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype) / denom
        return nn.Dense(self.matrix_size * self.matrix_size, name="fc")(
            gram.reshape(n, -1)
        )


class StyleTransform(nn.Module):
    """The learned 32x32 feature transformation (reference ``MulLayer``,
    linearStyleTransfer.py:43-94)."""

    matrix_size: int = 32
    in_channel: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, content, style, trans: bool = True,
                 valid_mask=None, n_valid=None):
        """content: (N, Hc, Wc, C); style: (N, Hs, Ws, C).
        Returns (fused (N, Hc, Wc, C), transmatrix (N, m, m)).

        ``valid_mask``/``n_valid``: content-map pixels beyond n_valid are
        padding (resolution bucketing) — the content mean and gram run
        over valid pixels only; padded outputs are cropped by the caller.
        Exact: every spatial op here is a 1x1 conv."""
        m = self.matrix_size
        n, ch, cw, c = content.shape

        if valid_mask is not None:
            c_mean = (
                jnp.sum(content * valid_mask, axis=(1, 2), keepdims=True)
                / n_valid
            )
        else:
            c_mean = jnp.mean(content, axis=(1, 2), keepdims=True)
        cF = content - c_mean
        s_mean = jnp.mean(style, axis=(1, 2), keepdims=True)
        sF = style - s_mean

        compress = nn.Conv(m, (1, 1), name="compress", dtype=self.dtype)
        unzip = nn.Conv(self.in_channel, (1, 1), name="unzip",
                        dtype=self.dtype)

        cc = compress(cF)  # (N, Hc, Wc, m)
        if not trans:
            return unzip(cc) + c_mean, None

        c_mat = GramCNN(m, self.in_channel, name="cnet",
                        dtype=self.dtype)(
            cF, valid_mask=valid_mask, n_valid=n_valid
        ).reshape(n, m, m)
        s_mat = GramCNN(m, self.in_channel, name="snet",
                        dtype=self.dtype)(sF).reshape(n, m, m)
        transmatrix = jnp.einsum(
            "nij,njk->nik", s_mat, c_mat,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ).astype(content.dtype)
        # apply to compressed content: (N,m,m) @ (N,m,HW)
        cc_flat = cc.reshape(n, ch * cw, m)
        fused = jnp.einsum(
            "nij,npj->npi", transmatrix, cc_flat,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ).astype(content.dtype).reshape(n, ch, cw, m)
        out = unzip(fused) + s_mean
        return out, transmatrix


class StyleNet(nn.Module):
    """Fusion + decode (reference ``style_net``,
    linearStyleTransfer.py:278-291). ``style=None, kind='content'`` decodes
    the raw feature map for the content-constraint loss."""

    nerf_out_dim: int = 64
    n_upsample_blocks: int = 0  # log2(img/featmap); 0 in the shipped config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.multi_net = StyleTransform(
            in_channel=self.nerf_out_dim, name="multi_net",
            dtype=self.dtype,
        )
        self.decoder = NeuralRenderer(
            feat_nc=self.nerf_out_dim, out_dim=3,
            n_blocks=self.n_upsample_blocks, name="decoder",
            dtype=self.dtype,
        )

    def __call__(self, content_feature, style_feature=None,
                 kind: Optional[str] = None, valid_mask=None,
                 n_valid=None):
        if valid_mask is not None and self.n_upsample_blocks > 0:
            raise ValueError(
                "bucketed (masked) decode requires the pointwise "
                "n_blocks=0 decoder"
            )
        if style_feature is None and kind == "content":
            return self.decoder(content_feature)
        fused, _ = self.multi_net(
            content_feature, style_feature, valid_mask=valid_mask,
            n_valid=n_valid,
        )
        return self.decoder(fused)

    def decode_batch(self, contents, styles, raw_extra=None,
                     valid_mask=None, n_valid=None):
        """Batched decode: ``contents`` (K, H, W, C) styled by ``styles``
        (K, 32, 32, C) in ONE StyleTransform + decoder pass, with
        ``raw_extra`` (M, H, W, C) appended un-styled (the content-
        constraint path). Returns (K+M, H, W, 3). Numerically identical
        to K+M separate ``__call__``s — per-sample convs/grams are
        batch-independent — with one launch per conv instead of K+M
        (the train step's decode long-tail, BASELINE.md).
        ``valid_mask`` (1, H, W, 1) + ``n_valid``: masked global stats
        for resolution-bucketed (padded) maps, as in ``__call__``."""
        if valid_mask is not None and self.n_upsample_blocks > 0:
            raise ValueError(
                "bucketed (masked) decode requires the pointwise "
                "n_blocks=0 decoder"
            )
        fused, _ = self.multi_net(contents, styles, valid_mask=valid_mask,
                                  n_valid=n_valid)
        dec_in = (
            fused if raw_extra is None
            else jnp.concatenate([fused, raw_extra], axis=0)
        )
        return self.decoder(dec_in)
