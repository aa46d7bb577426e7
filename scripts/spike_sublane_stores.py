"""Spike: cost of assembling a (96, T) transposed encode block from
(3, T) row pieces via static sublane-offset stores into VMEM scratch.

Decides feasibility of a v6 "rays-in" kernel that computes the posenc
recurrence in-kernel in transposed layout: the recurrence itself is cheap,
but its (3, T) states must land at arbitrary 3-row offsets of the block —
if Mosaic lowers such stores slowly, the path is dead.

Compares three kernels (marginal-timed, 2K vs K chained grid steps):
  base   — matmul on a preloaded block (reference cost)
  stores — same + 30 stores of (3,T) pieces at 3-row offsets + matmul
  dmatrix— same + exact in-kernel sin over a D@x args block (the
           assembly-free alternative) + matmul
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 512
ROWS = 96
N_TILES = 2048


def run(mode: str):
    w = jax.random.normal(jax.random.PRNGKey(0), (ROWS, 256),
                          jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (N_TILES * 8, T),
                          jnp.float32)

    def kernel(x_ref, w_ref, o_ref, scratch):
        xt = x_ref[:, :]  # (8, T)
        if mode == "stores":
            # 30 recurrence-state stores at 3-row offsets
            s = xt[0:3, :]
            c = xt[3:6, :]
            for k in range(15):
                s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
                scratch[3 * k:3 * k + 3, :] = s
                scratch[45 + 3 * k:45 + 3 * k + 3, :] = c
            scratch[90:93, :] = xt[0:3, :]
            blk = scratch[:, :]
        elif mode == "dmatrix":
            d = jax.lax.broadcasted_iota(
                jnp.int32, (ROWS, 8), 0
            ).astype(jnp.float32) * 0.01
            # stand-in for the (ROWS, 3->8pad) scale/select matrix
            args = jnp.dot(d, xt, preferred_element_type=jnp.float32)
            blk = jnp.sin(args)
        else:
            scratch[0:8, :] = xt
            blk = scratch[:, :]
        o_ref[:, :] = jax.lax.dot_general(
            blk.astype(jnp.bfloat16), w_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @functools.partial(jax.jit, static_argnames=("n",))
    def go(x, w, n):
        return pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((8, T), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ROWS, 256), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, 256), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n * T, 256), jnp.float32),
            scratch_shapes=[pltpu.VMEM((ROWS, T), jnp.float32)],
        )(x[: n * 8], w).sum()

    float(go(x, w, N_TILES // 2))
    float(go(x, w, N_TILES))
    t0 = time.perf_counter()
    float(go(x, w, N_TILES // 2))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(go(x, w, N_TILES))
    t2 = time.perf_counter() - t0
    per_tile = (t2 - t1) / (N_TILES // 2) * 1e6
    print(f"{mode:8s}: {per_tile:7.2f} us/tile")


if __name__ == "__main__":
    for m in ("base", "stores", "dmatrix"):
        run(m)
