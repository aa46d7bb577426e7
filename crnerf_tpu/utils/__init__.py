from crnerf_tpu.utils.checkpoint import (  # noqa: F401
    CheckpointManager,
    extract_submodule,
    load_selective,
    save_weights_only,
)
from crnerf_tpu.utils.logging import MetricLogger, save_code  # noqa: F401
from crnerf_tpu.utils.visualization import visualize_depth  # noqa: F401
