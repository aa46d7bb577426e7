"""Debug visualization: depth map -> JET colormap image.

Reference: utils/visualization.py:6-17 (cv2 JET colormap over the
min-max-normalized inverse? no — direct depth). Implemented in pure numpy so
it has no cv2 dependency in the hot path; cv2 is used only if present for
bit-identical JET colors.
"""

from __future__ import annotations

import numpy as np


def _jet(x: np.ndarray) -> np.ndarray:
    """Minimal JET colormap on [0,1] -> (..., 3) in [0,1]."""
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    return np.stack([r, g, b], -1)


def visualize_depth(depth, wh=None) -> np.ndarray:
    """depth (H*W,) or (H, W) -> (H, W, 3) float [0,1] JET image."""
    d = np.asarray(depth, np.float64)
    if d.ndim == 1:
        if wh is None:
            raise ValueError("flat depth needs wh=(w, h)")
        w, h = wh
        d = d.reshape(h, w)
    lo, hi = np.nanmin(d), np.nanmax(d)
    x = (d - lo) / max(hi - lo, 1e-8)
    try:
        import cv2  # type: ignore

        m = cv2.applyColorMap((x * 255).astype(np.uint8), cv2.COLORMAP_JET)
        return m[..., ::-1].astype(np.float32) / 255.0
    except Exception:
        return _jet(x).astype(np.float32)


def write_video(path_base: str, frames, fmt: str = "gif",
                fps: int = 30) -> str:
    """Write ``frames`` (list of HxWx3 uint8) as gif or mp4.

    Mirrors the reference's gif-or-mp4 choice (eval.py:301-304,
    appearance_modification_video.py). mp4 needs an ffmpeg/pyav imageio
    backend; when none is installed (this image has neither) we fall
    back to gif with a loud warning rather than losing the render.
    Returns the path actually written.
    """
    import imageio.v2 as imageio

    if fmt not in ("gif", "mp4"):
        raise ValueError(f"video_format must be gif|mp4, got {fmt!r}")
    path = f"{path_base}.{fmt}"
    if fmt == "mp4":
        try:
            imageio.mimsave(path, frames, fps=fps)
            return path
        except (ValueError, ImportError) as e:  # no mp4 backend
            import warnings

            path = f"{path_base}.gif"
            warnings.warn(
                f"mp4 backend unavailable ({e}); wrote {path} instead. "
                "Install imageio[ffmpeg] for mp4 output.", stacklevel=2,
            )
    imageio.mimsave(path, frames, fps=fps)
    return path
