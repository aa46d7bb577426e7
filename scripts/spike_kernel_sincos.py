"""Spike: accuracy of IN-KERNEL (Mosaic) sin/cos vs XLA's exact
elementwise ops, as a function of argument magnitude.

History: fused-MLP v2 computed the full posenc ladder in-kernel and
diverged at 2^14-rad arguments (~0.1 abs — BASELINE.md). The planned v5
kernel only needs in-kernel sin/cos at ANCHOR octaves (args <= 2^8 * 5
= 1280 rad) with the double-angle recurrence in between. This measures
whether Mosaic's range reduction is good enough at each anchor scale.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    def kernel(x_ref, s_ref, c_ref):
        x = x_ref[:, :]
        s_ref[:, :] = jnp.sin(x)
        c_ref[:, :] = jnp.cos(x)

    n = 1024
    x01 = jax.random.uniform(jax.random.PRNGKey(0), (n, 128),
                             minval=-1.0, maxval=1.0)
    for scale in [5.0, 5 * 2 ** 4, 5 * 2 ** 8, 5 * 2 ** 11, 5 * 2 ** 14]:
        x = (x01 * scale).astype(jnp.float32)
        s_k, c_k = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((n, 128), jnp.float32)] * 2,
        )(x)
        s_x, c_x = jnp.sin(x), jnp.cos(x)
        es = float(jnp.abs(s_k - s_x).max())
        ec = float(jnp.abs(c_k - c_x).max())
        print(f"max|arg|={scale:9.0f} rad: sin err {es:.3e}  "
              f"cos err {ec:.3e}")
    # ground truth check of XLA itself vs float64 numpy on moderate args
    xs = np.asarray(x01 * 1280.0, np.float64)
    xla = np.asarray(jnp.sin(jnp.asarray(xs, jnp.float32)))
    print("XLA sin vs f64 numpy @1280 rad:",
          f"{np.abs(xla - np.sin(xs)).max():.3e}")


if __name__ == "__main__":
    main()
