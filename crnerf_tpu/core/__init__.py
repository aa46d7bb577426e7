"""Pure-function render math: rays, positional encoding, depth sampling,
inverse-CDF resampling, alpha compositing. Everything here is shape-static,
side-effect free, and differentiable — the numerical contract the Pallas
kernels in ``crnerf_tpu.ops`` must reproduce bit-for-bit (fp32)."""

from crnerf_tpu.core.rays import (  # noqa: F401
    get_ray_directions,
    get_rays,
    get_ndc_rays,
)
from crnerf_tpu.core.encoding import posenc, posenc_dims  # noqa: F401
from crnerf_tpu.core.sampling import (  # noqa: F401
    stratified_zvals,
    perturb_zvals,
    sample_pdf,
)
from crnerf_tpu.core.compositing import composite  # noqa: F401
