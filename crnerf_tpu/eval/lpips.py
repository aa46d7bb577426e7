"""LPIPS (alex variant) in JAX/flax.

The reference scores renders with the ``lpips`` PyPI package's AlexNet
variant (/root/reference/eval_metric.py:63,97-99). That package (and any
pretrained weights) is unavailable in this offline image, so this module
ships the exact architecture — AlexNet feature trunk, per-layer unit
normalization, learned 1x1 linear heads, spatial average, layer sum
(Zhang et al., CVPR 2018) — with a weight-loading path:

    LpipsAlex(weights="lpips_alex.npz")

``scripts/export_lpips_weights.py`` converts the torch weights to that npz
on any machine with ``lpips`` installed. Without weights the class raises
at construction, and eval_metric falls back to PSNR/SSIM/MSE.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

# AlexNet conv trunk config: (out_ch, kernel, stride, pad)
_ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
# maxpool (3, stride 2) after conv idx:
_POOL_AFTER = {0, 1}
# feature taps: after relu of each conv
_N_TAPS = 5

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    ))),
    "weights", "lpips_alex.npz",
)


def _conv(x, w, b, stride, pad):
    # w: (kh, kw, cin, cout) HWIO
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b


def _maxpool3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _unit_normalize(x, eps=1e-10):
    n = jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True))
    return x / (n + eps)


class LpipsAlex:
    """Callable: (pred01, gt01) HWC or NHWC float [0,1] -> scalar LPIPS."""

    def __init__(self, weights: Optional[str] = None):
        path = weights or DEFAULT_WEIGHTS
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"LPIPS weights not found at {path}; convert them with "
                "scripts/export_lpips_weights.py on a machine with the "
                "'lpips' package"
            )
        z = np.load(path)
        self.conv_w = [z[f"conv{i}_w"] for i in range(len(_ALEX_CONVS))]
        self.conv_b = [z[f"conv{i}_b"] for i in range(len(_ALEX_CONVS))]
        self.lin_w = [z[f"lin{i}_w"] for i in range(_N_TAPS)]
        self._fn = jax.jit(self._forward)

    def _features(self, x01):
        # [0,1] -> [-1,1] -> lpips scaling
        x = x01 * 2.0 - 1.0
        x = (x - _SHIFT) / _SCALE
        taps = []
        for i, (c, k, s, p) in enumerate(_ALEX_CONVS):
            x = _conv(x, self.conv_w[i], self.conv_b[i], s, p)
            x = jax.nn.relu(x)
            taps.append(x)
            if i in _POOL_AFTER:
                x = _maxpool3s2(x)
        return taps

    def _forward(self, pred, gt):
        t_p = self._features(pred)
        t_g = self._features(gt)
        total = 0.0
        for i in range(_N_TAPS):
            d = (_unit_normalize(t_p[i]) - _unit_normalize(t_g[i])) ** 2
            # learned 1x1 conv head (non-negative weights), then spatial mean
            w = jnp.asarray(self.lin_w[i])  # (C,)
            val = jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
            total = total + val
        return jnp.mean(total)

    def __call__(self, pred01, gt01) -> float:
        p = jnp.asarray(pred01, jnp.float32)
        g = jnp.asarray(gt01, jnp.float32)
        if p.ndim == 3:
            p, g = p[None], g[None]
        return float(self._fn(p, g))
