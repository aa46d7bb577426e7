"""Test harness config: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware (the TPU-native
answer to the reference's untested DDP — SURVEY.md §4).

Note: this environment pre-registers a TPU PJRT plugin and pins
JAX_PLATFORMS in the ambient env, so the env var alone is not enough —
``jax.config.update("jax_platforms", "cpu")`` is the authoritative override.
"""

import os

# Must be set before the first backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got "
    f"{jax.devices()[0].platform}"
)
assert len(jax.devices()) == 8

# the suite is compile-dominated (~30-50 min, mostly XLA-CPU compiles of
# the same programs every run) — persistent cache makes re-runs cheap
from crnerf_tpu.utils.jit_cache import enable as _enable_jit_cache  # noqa: E402

_enable_jit_cache()
