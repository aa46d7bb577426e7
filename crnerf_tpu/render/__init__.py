from crnerf_tpu.render.renderer import render_rays, render_rays_tiled  # noqa: F401
from crnerf_tpu.render.system import CrNerfSystem, SystemModules  # noqa: F401
