"""Shared NN building blocks (NHWC): per-channel PReLU, reflection-padded
convs, torch-compatible pooling, pixel shuffle, bilinear resize."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class PReLU(nn.Module):
    """Per-channel PReLU (torch ``nn.PReLU(nOut)`` semantics, init 0.25)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", nn.initializers.constant(0.25), (x.shape[-1],), x.dtype
        )
        return jnp.where(x >= 0, x, alpha * x)


def leaky_relu(x, slope: float = 0.2):
    return jax.nn.leaky_relu(x, negative_slope=slope)


def reflect_pad(x, pad: int = 1):
    """NHWC reflection padding on H and W (torch ``nn.ReflectionPad2d``)."""
    return jnp.pad(
        x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect"
    )


def _s2d(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel order (p, q, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _d2s(y):
    """Inverse of _s2d for (p, q, f)-ordered output phases."""
    b, i, j, cf = y.shape
    f = cf // 4
    y = y.reshape(b, i, j, 2, 2, f)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * i, 2 * j, f)


def _s2d_assembly() -> np.ndarray:
    """Static 0/1 tensor A[dy, dx, r, s, p', q', p, q] scattering a 3x3
    kernel into the S2D 2x2 kernel: tap (dy, dx) lands at S2D offset
    (r, s), input phase (p', q'), output phase (p, q) iff
    dy == 2r + p' - p and dx == 2s + q' - q."""
    A = np.zeros((3, 3, 2, 2, 2, 2, 2, 2), np.float32)
    for r in range(2):
        for s in range(2):
            for pp in range(2):
                for qq in range(2):
                    for p in range(2):
                        for q in range(2):
                            dy = 2 * r + pp - p
                            dx = 2 * s + qq - q
                            if 0 <= dy <= 2 and 0 <= dx <= 2:
                                A[dy, dx, r, s, pp, qq, p, q] = 1.0
    return A


def _pack_kernel3x3(kernel):
    """(3, 3, C, F) -> the (2, 2, 4C, 4F) packed kernel of the equivalent
    2x2 conv on space-to-depth inputs (channel order (p, q, c))."""
    c, f = kernel.shape[2], kernel.shape[3]
    A = jnp.asarray(_s2d_assembly(), kernel.dtype)
    k2 = jnp.einsum("yxcf,yxrsabpq->rsabcpqf", kernel, A)
    return k2.reshape(2, 2, 4 * c, 4 * f)


def s2d_conv3x3(x, kernel, bias=None):
    """reflect-pad-1 + VALID 3x3 conv computed in space-to-depth form:
    a 2x2 conv on (H/2, W/2, 4C) with a (2, 2, 4C, 4F) packed kernel.

    Exactly the same math (scripts/spike_s2d.py proves fwd/dgrad/wgrad
    equivalence); the point is MXU utilization — 64/128-channel 3x3 convs
    under-fill the 128x128 systolic array (14-25% measured for the conv
    heads), while the packed form contracts over 4C with 4F outputs at
    16/9 the FLOPs. Net measured win on the bench head shapes decides the
    config default (Config.s2d_heads)."""
    y = jax.lax.conv_general_dilated(
        _s2d(reflect_pad(x, 1)), _pack_kernel3x3(kernel), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = _d2s(y)
    return out if bias is None else out + bias


def packed_reflect_pad1(xp):
    """Reflect-pad-1 IN PACKED SPACE: (B, I, J, 4C) -> (B, I+1, J+1, 4C).

    The packed image of the reflect-padded original re-pairs rows as
    (-1,0), (1,2), ..., (H-1,H): new phase p=0 rows are the old phase-1
    rows [0, 0..I-1] (row -1 reflects to row 1 = old[0].p1) and new p=1
    rows are the old phase-0 rows [0..I-1, I-1] (row H reflects to H-2 =
    old[I-1].p0); columns analogously on q. Pure slice/concat — no
    original-space round trip."""
    b, i, j, c4 = xp.shape
    c = c4 // 4
    v = xp.reshape(b, i, j, 2, 2, c)
    p0 = jnp.concatenate([v[:, :1, :, 1], v[:, :, :, 1]], 1)
    p1 = jnp.concatenate([v[:, :, :, 0], v[:, i - 1:i, :, 0]], 1)
    v = jnp.stack([p0, p1], axis=3)             # (b, i+1, j, 2, 2(q), c)
    q0 = jnp.concatenate([v[:, :, :1, :, 1], v[:, :, :, :, 1]], 2)
    q1 = jnp.concatenate([v[:, :, :, :, 0], v[:, :, j - 1:j, :, 0]], 2)
    v = jnp.stack([q0, q1], axis=4)             # (b, i+1, j+1, 2, 2, c)
    return v.reshape(b, i + 1, j + 1, c4)


def packed_conv3x3(xp, kernel, bias=None):
    """3x3 reflect-conv applied ENTIRELY in packed (s2d) space:
    (B, I, J, 4C) -> (B, I, J, 4F). Same math as s2d_conv3x3 but the
    halo comes from packed_reflect_pad1, so chained convs never unpack
    (the whole-stack schedule, AppearanceEncoder s2d_stack)."""
    y = jax.lax.conv_general_dilated(
        packed_reflect_pad1(xp), _pack_kernel3x3(kernel), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + jnp.tile(bias, 4)  # output channels are (p, q, f)
    return y


def packed_max_pool(xp):
    """MaxPool2d(2,2) of the ORIGINAL image, computed on its packed form:
    each original 2x2 block IS one packed pixel's four (p, q) phases, so
    the pool is a cross-phase max that UNPACKS for free:
    (B, I, J, 4C) -> (B, I, J, C) in original layout at half resolution."""
    b, i, j, c4 = xp.shape
    c = c4 // 4
    return xp.reshape(b, i, j, 4, c).max(axis=3)


class _ConvParams(nn.Module):
    """Param-compatible stand-in for ``nn.Conv`` (same child names/shapes/
    inits) that exposes the raw kernel/bias to a custom apply path."""

    features: int
    kernel: int
    use_bias: bool
    in_features: int = 0  # 0 -> infer from x (packed inputs carry 4C)

    @nn.compact
    def __call__(self, x, apply_fn):
        c_in = self.in_features or x.shape[-1]
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, c_in, self.features),
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias else None
        )
        return apply_fn(x, k, b)


class ConvRefl(nn.Module):
    """Reflection-pad + VALID conv — the reference's ReflectionPad2d+Conv2d
    pairs (linearStyleTransfer.py:101-126 and friends).

    ``s2d=True`` computes 3x3 convs on even-sized maps in space-to-depth
    form (see s2d_conv3x3) — identical params and math, different
    schedule on the MXU."""

    features: int
    kernel: int = 3
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    s2d: bool = False
    packed: bool = False  # x is ALREADY in s2d space (4C channels); conv
    # and halo stay packed (whole-stack schedule) — params identical

    @nn.compact
    def __call__(self, x):
        if self.packed:
            assert self.kernel == 3

            def apply_fn(x_, k, b):
                x_, k, b = nn.dtypes.promote_dtype(
                    x_, k, b, dtype=self.dtype
                )
                return packed_conv3x3(x_, k, b)

            return _ConvParams(
                self.features, self.kernel, self.use_bias,
                in_features=x.shape[-1] // 4, name="Conv_0",
            )(x, apply_fn)
        use_s2d = (
            self.s2d and self.kernel == 3
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        )
        if use_s2d:
            def apply_fn(x_, k, b):
                x_, k, b = nn.dtypes.promote_dtype(
                    x_, k, b, dtype=self.dtype
                )
                return s2d_conv3x3(x_, k, b)

            return _ConvParams(
                self.features, self.kernel, self.use_bias, name="Conv_0"
            )(x, apply_fn)
        p = (self.kernel - 1) // 2
        if p:
            x = reflect_pad(x, p)
        return nn.Conv(
            self.features, (self.kernel, self.kernel), padding="VALID",
            use_bias=self.use_bias, dtype=self.dtype,
        )(x)


def max_pool_2x2(x):
    """torch MaxPool2d(2,2) floor behavior: odd trailing row/col dropped.

    Deliberately ``lax.reduce_window`` (nn.max_pool): a reshape-max
    formulation (max over split 2x2 axes) looked cheaper on paper — its
    VJP avoids TPU's select-and-scatter — but measured 2% SLOWER
    end-to-end (161.9k vs 165.2k rays/s): the strided reshape transposes
    and two full-size compare-multiply VJP fusions outweigh the
    ~0.3 ms select-and-scatter they replace."""
    h, w = x.shape[1], x.shape[2]
    x = x[:, : h - h % 2, : w - w % 2, :]
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")


def avg_pool_3x3_s2_p1(x):
    """torch AvgPool2d(3, stride=2, padding=1) with count_include_pad=True
    (CGNet InputInjection, lightweight_seg.py:262-271)."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return nn.avg_pool(x, (3, 3), strides=(2, 2), padding="VALID")


def adaptive_avg_pool2d(x, out_hw: Tuple[int, int]):
    """Exact torch AdaptiveAvgPool2d for static input shapes.

    Bin i over an axis of size S covers [floor(i*S/O), ceil((i+1)*S/O)).
    Implemented as two small matmuls against trace-time bin-indicator
    matrices — exact (no long accumulation chains) and MXU-friendly for
    arbitrary static input sizes.
    """
    n, h, w, c = x.shape
    oh, ow = out_hw

    def bin_matrix(size, out):
        starts = np.floor(np.arange(out) * size / out).astype(np.int64)
        ends = np.ceil((np.arange(out) + 1) * size / out).astype(np.int64)
        m = np.zeros((out, size), np.float32)
        for i, (s, e) in enumerate(zip(starts, ends)):
            m[i, s:e] = 1.0 / (e - s)
        return m

    eh = jnp.asarray(bin_matrix(h, oh), x.dtype)  # (oh, h)
    ew = jnp.asarray(bin_matrix(w, ow), x.dtype)  # (ow, w)
    # HIGHEST precision: this is a pooling op — bf16 MXU passes would inject
    # ~1e-3 noise into the style embedding for negligible FLOP savings.
    hp = jax.lax.Precision.HIGHEST
    y = jnp.einsum("oh,nhwc->nowc", eh, x, precision=hp,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("pw,nowc->nopc", ew, y, precision=hp,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def global_avg_pool(x):
    """AdaptiveAvgPool2d(1) -> (N, C)."""
    return jnp.mean(x, axis=(1, 2))


def pixel_shuffle(x, r: int = 2):
    """torch ``F.pixel_shuffle`` on NHWC.

    Input channel index decomposes as c*r*r + i*r + j (torch convention);
    output[b, h*r+i, w*r+j, c] = input[b, h, w, c*r*r + i*r + j].
    """
    n, h, w, c4 = x.shape
    c = c4 // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, i, w, j, c
    return x.reshape(n, h * r, w * r, c)


def resize_bilinear(x, out_hw: Tuple[int, int]):
    """Bilinear resize with half-pixel centers — matches torch
    ``F.interpolate(mode='bilinear', align_corners=False)`` (the reference's
    mask upsampling, train_mask_grid_sample.py:172)."""
    n, h, w, c = x.shape
    return jax.image.resize(
        x, (n, out_hw[0], out_hw[1], c), method="bilinear"
    )


def sample_bilinear_uv(img, uv):
    """Sample img (H, W, C) at normalized uv coords (N, 2) = (v, u) in [0,1),
    half-pixel convention matching interpolate-then-index on the pixel the
    grid sampler floors to.

    TPU-native replacement for the reference's materialize-full-res-mask +
    flat-index gather (train_mask_grid_sample.py:170-176): we gather only the
    N sampled points.
    """
    h, w, c = img.shape
    # map normalized coord -> continuous source coord (align_corners=False)
    y = uv[:, 0] * h - 0.5
    x = uv[:, 1] * w - 0.5
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = y - y0
    wx = x - x0

    def at(yy, xx):
        yy = jnp.clip(yy.astype(jnp.int32), 0, h - 1)
        xx = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
        return img[yy, xx]

    v00 = at(y0, x0)
    v01 = at(y0, x0 + 1)
    v10 = at(y0 + 1, x0)
    v11 = at(y0 + 1, x0 + 1)
    top = v00 * (1 - wx)[:, None] + v01 * wx[:, None]
    bot = v10 * (1 - wx)[:, None] + v11 * wx[:, None]
    return top * (1 - wy)[:, None] + bot * wy[:, None]
