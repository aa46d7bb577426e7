"""Image metrics: MSE, PSNR, SSIM.

Reference: /root/reference/metrics.py:4-20 — PSNR = -10*log10(MSE); SSIM via
kornia with window_size=3 (a *gaussian* window, sigma=1.5, reflect-padded,
C1=0.01^2, C2=0.03^2). We reproduce kornia's exact SSIM so parity numbers
are trustworthy (SURVEY.md §7 hard part 5).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def mse(pred, gt, valid_mask=None):
    v = (pred - gt) ** 2
    if valid_mask is not None:
        v = v[valid_mask]
    return jnp.mean(v)


def psnr(pred, gt, valid_mask=None):
    return -10.0 * jnp.log10(mse(pred, gt, valid_mask))


def _gaussian_kernel1d(window_size: int, sigma: float) -> np.ndarray:
    """kornia get_gaussian_kernel1d: gaussian at integer offsets from the
    window center, normalized to sum 1."""
    x = np.arange(window_size, dtype=np.float64) - (window_size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _filter2d_reflect(x, kernel2d):
    """Depthwise 2D filter with reflect padding on NHWC (kornia filter2d
    border_type='reflect')."""
    kh, kw = kernel2d.shape
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    c = x.shape[-1]
    xpad = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="reflect")
    k = jnp.tile(
        jnp.asarray(kernel2d, x.dtype)[:, :, None, None], (1, 1, 1, c)
    )
    return jax.lax.conv_general_dilated(
        xpad, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def ssim_map(img1, img2, window_size: int = 3, max_val: float = 1.0,
             sigma: float = 1.5):
    """Per-pixel SSIM map, NHWC inputs in [0, max_val]. Matches
    kornia.metrics.ssim (gaussian window, reflect padding)."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    g1 = _gaussian_kernel1d(window_size, sigma)
    k2d = np.outer(g1, g1)

    mu1 = _filter2d_reflect(img1, k2d)
    mu2 = _filter2d_reflect(img2, k2d)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu12 = mu1 * mu2
    s1_sq = _filter2d_reflect(img1 * img1, k2d) - mu1_sq
    s2_sq = _filter2d_reflect(img2 * img2, k2d) - mu2_sq
    s12 = _filter2d_reflect(img1 * img2, k2d) - mu12

    num = (2 * mu12 + c1) * (2 * s12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (s1_sq + s2_sq + c2)
    return num / den


def ssim(img1, img2, window_size: int = 3, max_val: float = 1.0):
    """Mean SSIM. Accepts NHWC or HWC."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    return jnp.mean(ssim_map(img1, img2, window_size, max_val))
