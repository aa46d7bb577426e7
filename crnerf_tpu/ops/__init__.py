"""Pallas TPU kernels for the render hot path, each with a pure-jnp
reference implementation and equivalence tests (SURVEY.md §2.9: the
reference ships no native code — its CUDA kernels are implicit in torch;
these kernels are the TPU build's native components).

- ``fused_mlp``:   positional-encode + full NeRF MLP evaluation in ONE
                   kernel — activations never round-trip to HBM between
                   layers (the tiny-cuda-nn trick, TPU-style).
- ``composite``:   alpha-compositing transmittance scan along the sample
                   axis.
"""

from crnerf_tpu.ops.fused_mlp import (  # noqa: F401
    fused_mlp_apply,
    grouped_encode,
    make_fused_mlp_train,
    mlp_params_from_flax,
    reference_mlp_apply,
)
from crnerf_tpu.ops.composite import composite_pallas  # noqa: F401
