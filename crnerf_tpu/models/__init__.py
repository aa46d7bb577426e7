"""Flax modules for every network in the CR-NeRF model zoo.

Layout convention: images are NHWC (TPU-native; the reference uses NCHW).
Channel *indices* match the reference ordering so per-channel parity checks
and weight ports are mechanical transposes.
"""

from crnerf_tpu.models.nerf_mlp import NerfMLP, NerfWMLP, NerfTanhMLP  # noqa: F401
from crnerf_tpu.models.appearance import (  # noqa: F401
    AppearanceEncoder,
    Encoder3,
    Decoder3,
)
from crnerf_tpu.models.style import GramCNN, StyleTransform, StyleNet  # noqa: F401
from crnerf_tpu.models.decoder import (  # noqa: F401
    NeuralRenderer,
    PixelShuffleUpsample,
    Blur,
    get_renderer,
)
from crnerf_tpu.models.cgnet import ContextGuidedNetwork  # noqa: F401
from crnerf_tpu.models.networks import EAttr, ImplicitMask  # noqa: F401
from crnerf_tpu.models.esrgan import RRDBNet  # noqa: F401
