"""Tensor-parallel (auto-SPMD) train step — the SURVEY §2.9 stretch axis.

The reference has exactly one parallelism strategy (Lightning DDP /
NCCL — /root/reference/train_mask_grid_sample.py:445-447); this framework's
production path is its TPU equivalent (shard_map + psum, parallel/mesh.py).
CR-NeRF's MLP is ~0.6M params, so tensor parallelism is never *required* —
SURVEY.md §2.9 lists it as the one optional stretch — but the framework
demonstrates it the idiomatic XLA way, as a second, annotation-driven
distribution mode:

- a 2-D ``Mesh`` with axes ``('data', 'model')``;
- batch grids sharded on ``data``, parameter/optimizer tensors sharded on
  their last MXU dimension over ``model`` (Megatron-style column split of
  every Dense kernel; XLA's SPMD partitioner propagates the activation
  shardings and inserts the all-gathers/reduce-scatters over ICI);
- ONE ``jax.jit`` of the ordinary single-chip train step with
  ``in_shardings``/``out_shardings`` — no hand-written collectives at all.

This runs the pure-XLA render path: the Pallas fused kernels hold a whole
weight replica in VMEM by design (ops/fused_render.py), which is the right
trade at this model size, so the two modes pair naturally — shard_map+Pallas
when the model fits (production), jit+annotations when a future model
doesn't. Numerical equivalence with the single-device step is pinned in
tests/test_tp.py on the 8-device virtual mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from crnerf_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"


def make_mesh_2d(
    n_data: int, n_model: int, devices: Optional[Sequence] = None
) -> Mesh:
    """(data, model) mesh over the first n_data*n_model devices.

    Lay the model axis minor so its collectives ride the fastest ICI
    neighbours (scaling-book recipe: inner axis = highest-bandwidth loop).
    """
    devs = list(devices) if devices is not None else jax.devices()
    need = n_data * n_model
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    grid = np.asarray(devs[:need]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _last_dim_spec(shape: Tuple[int, ...], n_model: int) -> P:
    """Shard the trailing dim over MODEL_AXIS when it tiles evenly and is
    worth splitting; replicate otherwise. Trailing-dim-only keeps every
    Dense a column split (its consumer's row split is then XLA's choice —
    the partitioner picks gather-vs-scatter per op)."""
    if not shape:
        return P()
    last = shape[-1]
    if last % n_model == 0 and last >= 2 * n_model:
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    return P()


def tp_state_sharding(state, mesh: Mesh):
    """A TrainState-shaped pytree of NamedShardings: params and optimizer
    moments column-split over MODEL_AXIS, everything else (cache, rng,
    step, BN stats) replicated."""
    n_model = mesh.shape[MODEL_AXIS]

    def rule(path, leaf):
        names = {
            getattr(k, "name", getattr(k, "key", None)) for k in path
        }
        shardable = names & {"params", "opt_state"}
        if shardable and hasattr(leaf, "shape") and np.ndim(leaf) >= 2:
            return NamedSharding(mesh, _last_dim_spec(leaf.shape, n_model))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, state)


def tp_batch_sharding(batch, mesh: Mesh):
    """Batch leaves carry a leading grids axis -> shard it over DATA_AXIS
    (the grids are the DP unit, exactly as in shard_map mode)."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(lambda _: sh, batch)


def shard_train_step_tp(train_step, state, batch, mesh: Mesh):
    """jit the ordinary (global, axis_name=None) train step over the 2-D
    mesh purely via sharding annotations.

    ``state``/``batch`` are abstract or concrete exemplars used only for
    their tree structure. Returns (jitted_step, state_shardings,
    batch_shardings); callers device_put their state/batch with the
    returned shardings before stepping.
    """
    state_sh = tp_state_sharding(state, mesh)
    batch_sh = tp_batch_sharding(batch, mesh)
    rep = NamedSharding(mesh, P())

    jstep = jax.jit(
        train_step,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, rep),
    )
    return jstep, state_sh, batch_sh
