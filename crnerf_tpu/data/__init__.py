from crnerf_tpu.data.sampler import GridSampler, grid_sample_indices  # noqa: F401
from crnerf_tpu.data.scene import Scene, SceneImage  # noqa: F401
from crnerf_tpu.data.synthetic import make_synthetic_scene  # noqa: F401
from crnerf_tpu.data.pipeline import TrainPipeline  # noqa: F401
