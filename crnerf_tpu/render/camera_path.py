"""Parametric test/demo camera paths.

The reference hard-codes per-scene pose sweeps inline in two entry points
(/root/reference/eval.py:131-268 and
appearance_modification_video.py:121-189): starting from an anchor c2w, each
frame adds piecewise-linear translation offsets and applies a euler-angle
rotation ramp; intrinsics are a fov-60° pinhole at the requested size.

Here that becomes one declarative ``PathSpec`` (per-axis lists of linspace
segments) + an evaluator, with the reference demos' motion presets as data.
Presets keep the reference's appearance-source picks (brandenburg idx 314,
trevi 1548, sacre 58 — eval.py:154,199,226) so demo outputs are comparable.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

Segment = Tuple[float, float, float]  # (start, end, fraction_of_frames)


def euler_to_rotmat(theta: Sequence[float]) -> np.ndarray:
    """Rx(θx) @ Ry(θy) @ Rz(θz) (reference eulerAnglesToRotationMatrix,
    eval.py:61-76)."""
    cx, sx = math.cos(theta[0]), math.sin(theta[0])
    cy, sy = math.cos(theta[1]), math.sin(theta[1])
    cz, sz = math.cos(theta[2]), math.sin(theta[2])
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rx @ ry @ rz


def piecewise_linspace(segments: Sequence[Segment], n: int) -> np.ndarray:
    """Concatenate linspace segments; fractions are of n and the final
    segment absorbs rounding remainder."""
    if not segments:
        return np.zeros(n)
    counts = [int(n * frac) for (_, _, frac) in segments[:-1]]
    counts.append(n - sum(counts))
    return np.concatenate([
        np.linspace(s, e, c) for (s, e, _), c in zip(segments, counts)
    ])


@dataclasses.dataclass(frozen=True)
class PathSpec:
    dx: Sequence[Segment] = ()
    dy: Sequence[Segment] = ()
    dz: Sequence[Segment] = ()
    theta_x: Sequence[Segment] = ()
    theta_y: Sequence[Segment] = ()
    theta_z: Sequence[Segment] = ()
    n_frames: int = 240  # 30 fps x 8 s in the reference demos
    appearance_train_idx: Optional[int] = None  # appearance-source image
    # Pose anchor: the reference anchors the path on a DIFFERENT image than
    # the appearance source for brandenburg (poses_dict[1123] — an image ID,
    # eval.py:178) and sacre (img_ids_train[99], eval.py:258); trevi anchors
    # on the appearance image itself (eval.py:220).
    pose_image_id: Optional[int] = None    # direct image id (poses_dict key)
    pose_train_idx: Optional[int] = None   # index into img_ids_train

    def poses(self, anchor_c2w: np.ndarray) -> np.ndarray:
        """(n_frames, 3, 4) camera path around the anchor pose."""
        n = self.n_frames
        dx = piecewise_linspace(self.dx, n)
        dy = piecewise_linspace(self.dy, n)
        dz = piecewise_linspace(self.dz, n)
        tx = piecewise_linspace(self.theta_x, n)
        ty = piecewise_linspace(self.theta_y, n)
        tz = piecewise_linspace(self.theta_z, n)
        out = np.tile(np.asarray(anchor_c2w, np.float64), (n, 1, 1))
        out[:, 0, 3] += dx
        out[:, 1, 3] += dy
        out[:, 2, 3] += dz
        for i in range(n):
            out[i, :, :3] = euler_to_rotmat((tx[i], ty[i], tz[i])) @ (
                out[i, :, :3]
            )
        return out.astype(np.float32)


def fov_intrinsics(img_wh: Tuple[int, int],
                   fov_deg: float = 60.0) -> np.ndarray:
    """Pinhole K with horizontal fov (reference test_K, eval.py:135-139)."""
    w, h = img_wh
    focal = w / 2 / math.tan(math.radians(fov_deg) / 2)
    return np.array(
        [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]], np.float32
    )


# ---------------------------------------------------------------- presets
# Motion constants mirror the reference demos (eval.py:157-268,
# appearance_modification_video.py:121-181). Sweep shape: gentle dolly +
# lateral pan with a yaw sweep framing the monument.
_PI = math.pi

PATH_PRESETS: Dict[str, PathSpec] = {
    "brandenburg_gate": PathSpec(
        # The reference builds dx as concat(linspace(-0.25, 0.25, 240),
        # linspace(0.25, 0.38, 120)) — 360 entries — but only frames
        # 0..239 are ever rendered (eval.py:157-160), so the EFFECTIVE
        # path consumes just the first linspace. Reproduced as-consumed.
        dx=[(-0.25, 0.25, 1.0)],
        dy=[(0.05, -0.1, 0.5), (-0.1, 0.05, 0.5)],
        dz=[(0.1, 0.3, 0.5), (0.3, 0.1, 0.5)],
        theta_x=[(_PI / 30, 0.0, 0.5), (0.0, _PI / 30, 0.5)],
        theta_y=[(_PI / 10, -_PI / 10, 1.0)],
        appearance_train_idx=314,
        pose_image_id=1123,
    ),
    "trevi_fountain": PathSpec(
        dx=[(-0.8, 0.7, 1.0)],
        dy=[(0.0, 0.05, 0.5), (0.05, 0.0, 0.5)],
        dz=[(0.4, 0.1, 0.25), (0.1, 0.5, 0.25),
            (0.5, 0.1, 0.25), (0.1, 0.4, 0.25)],
        theta_y=[(_PI / 6, -_PI / 6, 1.0)],
        appearance_train_idx=1548,
        pose_train_idx=1548,
    ),
    "sacre_coeur": PathSpec(
        dx=[(-2.0, 2.0, 1.0)],
        dy=[(0.0, 2.0, 0.5), (2.0, 0.0, 0.5)],
        dz=[(0.0, -3.0, 0.5), (-3.0, 0.0, 0.5)],
        theta_y=[(_PI / 6, -_PI / 6, 1.0)],
        appearance_train_idx=58,
        pose_train_idx=99,
    ),
}

# Anchor poses for the standalone video demo (the reference inlines these
# c2w matrices since the demo runs without COLMAP data —
# appearance_modification_video.py:124-127,152-155). Near-identity rotations
# slightly tilted toward the monument.
DEMO_ANCHORS: Dict[str, np.ndarray] = {
    "brandenburg_gate": np.array(
        [[0.997, 0.0017, -0.077, 0.0355],
         [0.0108, -0.9929, 0.1181, 0.0234],
         [-0.0763, -0.1186, -0.9900, 0.1216]], np.float32
    ),
    "trevi_fountain": np.array(
        [[0.9997, -0.0049, -0.0232, -0.0266],
         [-0.0065, -0.9974, -0.0712, -0.0007],
         [-0.0228, 0.0713, -0.9972, 0.0008]], np.float32
    ),
}


def resolve_scene(scene_name: str) -> str:
    """Match the reference's suffix parsing ('..._brandenburg_gate' etc. —
    appearance_modification_video.py:214-219)."""
    for key in PATH_PRESETS:
        if scene_name.endswith(key) or key in scene_name:
            return key
    raise KeyError(
        f"no camera-path preset for scene {scene_name!r}; "
        f"available: {sorted(PATH_PRESETS)}"
    )


def test_path_rays(
    spec: PathSpec,
    anchor_c2w: np.ndarray,
    img_wh: Tuple[int, int],
    near: float,
    far: float,
    fov_deg: float = 60.0,
):
    """Yield (h*w, 8) ray batches for each path frame."""
    from crnerf_tpu.core.rays import get_ray_directions, make_ray_buffer

    K = fov_intrinsics(img_wh, fov_deg)
    w, h = img_wh
    dirs = get_ray_directions(h, w, K)
    for c2w in spec.poses(anchor_c2w):
        yield make_ray_buffer(dirs, c2w, near, far, 0)[:, :8]
