from crnerf_tpu.data.sampler import GridSampler, grid_sample_indices  # noqa: F401
from crnerf_tpu.data.scene import Scene, SceneImage  # noqa: F401
from crnerf_tpu.data.synthetic import make_synthetic_scene  # noqa: F401
from crnerf_tpu.data.pipeline import TrainPipeline, full_image_batch  # noqa: F401
from crnerf_tpu.data.blender import load_blender, add_perturbation  # noqa: F401
from crnerf_tpu.data.phototourism import (  # noqa: F401
    load_phototourism,
    load_scene_cache,
    save_scene_cache,
)

# dataset registry (reference datasets/__init__.py:5-6)
dataset_dict = {
    "blender": load_blender,
    "phototourism": load_phototourism,
    "synthetic": make_synthetic_scene,
}
