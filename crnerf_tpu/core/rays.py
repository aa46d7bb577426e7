"""Camera-ray generation.

Matches the reference semantics exactly (``/root/reference/datasets/
ray_utils.py``): pixel-corner sampling with NO +0.5 centering
(ray_utils.py:20-24), y/z-flipped camera frame ("right-up-back"), world-space
directions normalized to unit length (ray_utils.py:44-45), and the (unused in
the main path, still provided) NDC transform (ray_utils.py:55-96).

These run in numpy or jnp transparently (the data layer builds ray buffers on
host with numpy; jitted code can regenerate rays on device with jnp).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _xp(x):
    return jnp if isinstance(x, jnp.ndarray) else np


def get_ray_directions(H: int, W: int, K, xp=np):
    """Per-pixel ray directions in the camera frame.

    K is a (3,3) intrinsics matrix. Returns (H, W, 3). Uses pixel indices
    without half-pixel centering, with the reference's right-up-back
    convention: d = ((i-cx)/fx, -(j-cy)/fy, -1).
    """
    fx, fy, cx, cy = K[0][0], K[1][1], K[0][2], K[1][2]
    j, i = xp.meshgrid(
        xp.arange(H, dtype=xp.float32),
        xp.arange(W, dtype=xp.float32),
        indexing="ij",
    )
    dirs = xp.stack(
        [(i - cx) / fx, -(j - cy) / fy, -xp.ones_like(i)], axis=-1
    )
    return dirs


def get_rays(directions, c2w):
    """World-space ray origins and unit directions.

    directions: (H, W, 3) camera-frame dirs; c2w: (3, 4).
    Returns rays_o, rays_d each (H*W, 3); rays_d normalized
    (ray_utils.py:44-49).
    """
    xp = _xp(directions) if not isinstance(directions, np.ndarray) else np
    rays_d = directions @ xp.swapaxes(c2w[:, :3], -1, -2)
    rays_d = rays_d / xp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = xp.broadcast_to(c2w[:, 3], rays_d.shape)
    return rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)


def get_ndc_rays(H: int, W: int, focal: float, near, rays_o, rays_d):
    """Transform world rays to NDC (ray_utils.py:55-96). Unused by the main
    CR-NeRF path but part of the public surface."""
    xp = _xp(rays_o) if not isinstance(rays_o, np.ndarray) else np
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    ox_oz = rays_o[..., 0] / rays_o[..., 2]
    oy_oz = rays_o[..., 1] / rays_o[..., 2]

    o0 = -1.0 / (W / (2.0 * focal)) * ox_oz
    o1 = -1.0 / (H / (2.0 * focal)) * oy_oz
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2] - ox_oz)
    d1 = -1.0 / (H / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2] - oy_oz)
    d2 = 1.0 - o2

    return xp.stack([o0, o1, o2], -1), xp.stack([d0, d1, d2], -1)


def make_ray_buffer(directions, c2w, near: float, far: float, ts: int, xp=np):
    """Pack one image's rays into the reference's flat 9-float layout:
    [o(3), d(3), near, far, ts] (phototourism…py:204-208)."""
    rays_o, rays_d = get_rays(directions, c2w)
    n = rays_o.shape[0]
    ones = xp.ones((n, 1), dtype=xp.float32)
    return xp.concatenate(
        [rays_o, rays_d, near * ones, far * ones, float(ts) * ones], axis=1
    ).astype(xp.float32)
