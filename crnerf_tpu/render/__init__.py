from crnerf_tpu.render.renderer import render_rays, render_rays_tiled  # noqa: F401
from crnerf_tpu.render.system import CrNerfSystem, SystemModules  # noqa: F401
from crnerf_tpu.render.inference import Renderer  # noqa: F401
from crnerf_tpu.render.camera_path import (  # noqa: F401
    DEMO_ANCHORS,
    PATH_PRESETS,
    PathSpec,
    fov_intrinsics,
    test_path_rays,
)
