"""CGNet transient-object mask network.

Reference: ``Context_Guided_Network``
(/root/reference/models/lightweight_seg.py:274-368) instantiated with
classes=1, M=2, N=2, input_channel=3 (train_mask_grid_sample.py:114). Predicts
a per-pixel occluder probability from the whole (normalized) image; the
training loop bilinearly resizes the map to the full image and gathers the
sampled grid pixels.

Context-guided blocks combine a local 3x3 depthwise conv, a dilated
"surround" depthwise conv, BN+PReLU over their concat, and a squeeze-excite
global gate (``FGlo``). Stage 2/3 downsample; input injections feed pooled
copies of the RGB input into each stage.

BatchNorm note: the reference runs BN in train mode on batch size 1 (one
whole image per step — SURVEY.md §2.8). We keep BatchNorm for fidelity
(batch statistics over the single image's spatial extent is what torch does
with a (1,C,H,W) input) and offer ``norm='group'`` as a principled
alternative.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import linen as nn

from crnerf_tpu.models.common import (
    PReLU,
    avg_pool_3x3_s2_p1,
    global_avg_pool,
    resize_bilinear,
)


class _Norm(nn.Module):
    kind: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not train, epsilon=1e-3, momentum=0.9
            )(x)
        c = x.shape[-1]
        groups = next(g for g in (8, 4, 2, 1) if c % g == 0)
        return nn.GroupNorm(num_groups=groups)(x)


class ConvBNPReLU(nn.Module):
    n_out: int
    k: int
    stride: int = 1
    norm: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.k - 1) // 2
        x = nn.Conv(
            self.n_out, (self.k, self.k), strides=(self.stride, self.stride),
            padding=((p, p), (p, p)), use_bias=False, dtype=self.dtype,
        )(x)
        x = x.astype(jnp.float32)
        x = _Norm(self.norm)(x, train)
        return PReLU()(x)


class BNPReLU(nn.Module):
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _Norm(self.norm)(x, train)
        return PReLU()(x)


class DepthwiseConv3x3(nn.Module):
    """3x3 depthwise (optionally dilated) conv as NINE shifted
    multiply-adds.

    Depthwise convs have no channel contraction, so XLA's TPU conv
    emitters run them on the VPU with poor tiling — the F_sur backward
    fusions alone cost ~9 ms/step inside the chunked train scan
    (BASELINE.md, 2026-08-17). The tap formulation lowers to plain
    elementwise multiply-adds that XLA fuses and pipelines (~bandwidth
    cost only). Param name/shape match ``nn.Conv(feature_group_count=C)``
    — kernel (3, 3, 1, C) — so weight ports and checkpoints are
    unchanged."""

    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 1, c)
        )
        d = self.dilation
        h, w = x.shape[1], x.shape[2]
        xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
        out = None
        for i in range(3):
            for j in range(3):
                tap = xp[:, i * d:i * d + h, j * d:j * d + w, :] * (
                    kernel[i, j, 0]
                )
                out = tap if out is None else out + tap
        return out


def _channelwise_conv(x, features, k, dilation=1, name=None, module=None):
    assert k == 3 and features == x.shape[-1]
    return DepthwiseConv3x3(dilation=dilation, name=name)(x)


class FGlo(nn.Module):
    """Squeeze-excite global gate (lightweight_seg.py:173-191)."""

    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = global_avg_pool(x)
        y = nn.relu(nn.Dense(self.channel // self.reduction)(y))
        y = nn.sigmoid(nn.Dense(self.channel)(y))
        return x * y[:, None, None, :]


class ContextGuidedBlockDown(nn.Module):
    """(H,W,Cin) -> (H/2, W/2, n_out) (lightweight_seg.py:193-227)."""

    n_out: int
    dilation: int = 2
    reduction: int = 16
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNPReLU(self.n_out, 3, 2, self.norm, name="conv1x1")(x, train)
        loc = _channelwise_conv(x, self.n_out, 3, 1, name="F_loc")
        sur = _channelwise_conv(x, self.n_out, 3, self.dilation, name="F_sur")
        joi = jnp.concatenate([loc, sur], -1)
        joi = _Norm(self.norm)(joi, train)
        joi = PReLU()(joi)
        joi = nn.Conv(self.n_out, (1, 1), use_bias=False, name="reduce")(joi)
        return FGlo(self.n_out, self.reduction)(joi)


class ContextGuidedBlock(nn.Module):
    """Residual CG block (lightweight_seg.py:230-260)."""

    n_out: int
    dilation: int = 2
    reduction: int = 16
    add: bool = True
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = self.n_out // 2
        h = ConvBNPReLU(n, 1, 1, self.norm, name="conv1x1")(x, train)
        loc = _channelwise_conv(h, n, 3, 1, name="F_loc")
        sur = _channelwise_conv(h, n, 3, self.dilation, name="F_sur")
        joi = jnp.concatenate([loc, sur], -1)
        joi = BNPReLU(self.norm, name="bn_prelu")(joi, train)
        out = FGlo(self.n_out, self.reduction)(joi)
        return x + out if self.add else out


class ContextGuidedNetwork(nn.Module):
    classes: int = 1
    M: int = 2
    N: int = 2
    input_channel: int = 3
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (N, H, W, input_channel) normalized image ->
        (N, H, W, classes) sigmoid mask."""
        in_hw = x.shape[1:3]
        out0 = ConvBNPReLU(32, 3, 2, self.norm, name="level1_0")(x, train)
        out0 = ConvBNPReLU(32, 3, 1, self.norm, name="level1_1")(out0, train)
        out0 = ConvBNPReLU(32, 3, 1, self.norm, name="level1_2")(out0, train)
        inp1 = avg_pool_3x3_s2_p1(x)
        inp2 = avg_pool_3x3_s2_p1(inp1)

        cat0 = BNPReLU(self.norm, name="b1")(
            jnp.concatenate([out0, inp1], -1), train
        )
        out1_0 = ContextGuidedBlockDown(
            64, 2, 8, self.norm, name="level2_0"
        )(cat0, train)
        out1 = out1_0
        for i in range(self.M - 1):
            out1 = ContextGuidedBlock(
                64, 2, 8, norm=self.norm, name=f"level2_{i + 1}"
            )(out1, train)
        cat1 = BNPReLU(self.norm, name="bn_prelu_2")(
            jnp.concatenate([out1, out1_0, inp2], -1), train
        )

        out2_0 = ContextGuidedBlockDown(
            128, 4, 16, self.norm, name="level3_0"
        )(cat1, train)
        out2 = out2_0
        for i in range(self.N - 1):
            out2 = ContextGuidedBlock(
                128, 4, 16, norm=self.norm, name=f"level3_{i + 1}"
            )(out2, train)
        cat2 = BNPReLU(self.norm, name="bn_prelu_3")(
            jnp.concatenate([out2_0, out2], -1), train
        )

        logits = nn.Conv(self.classes, (1, 1), name="classifier")(cat2)
        up = resize_bilinear(logits, in_hw)
        return nn.sigmoid(up)
