from crnerf_tpu.train.losses import (  # noqa: F401
    ColorLoss,
    CosineAnnealingWeight,
    ExponentialAnnealingWeight,
    crnerf_loss,
)
from crnerf_tpu.train.metrics import mse, psnr, ssim  # noqa: F401
from crnerf_tpu.train.optim import make_optimizer  # noqa: F401
from crnerf_tpu.train.state import TrainState  # noqa: F401
