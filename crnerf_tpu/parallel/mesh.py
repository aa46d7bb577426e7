"""Device mesh & sharding helpers — the framework's distribution layer.

The reference's entire distributed surface is a Lightning DDP strategy
string riding NCCL (/root/reference/train_mask_grid_sample.py:445-447,
SURVEY.md §2.9). TPU-native, that becomes: a ``jax.sharding.Mesh`` over the
chips, replicated train state, batches sharded on a leading 'data' axis, and
``shard_map`` running the per-device step with ``psum``/``all_gather``
collectives over ICI. Multi-host (DCN) works unchanged — jax.distributed
initializes process groups and the same mesh spans all processes.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    n_devices: int = 0, devices: Optional[Sequence] = None
) -> Mesh:
    """1-D data mesh over the first n_devices local devices (0 = all).

    For CR-NeRF the model is ~1M params — pure DP is the right layout; the
    mesh abstraction still leaves room for extra axes later (SURVEY.md §2.9:
    TP unnecessary at this size).
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices and n_devices > 0:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_train_step(
    train_step: Callable, mesh: Mesh, donate_state: bool = True
) -> Callable:
    """Wrap a per-device train step (built with axis_name=DATA_AXIS) into a
    jitted SPMD step over the mesh.

    state is replicated; every leaf of the batch is sharded on its leading
    device axis (size = mesh size). Inside shard_map each device sees a
    leading axis of 1, which we squeeze before the per-device step.
    """

    def per_device(state, batch):
        local = jax.tree.map(lambda x: x[0], batch)
        return train_step(state, local)

    mapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate_state else ())


def shard_train_scan(
    per_step: Callable, mesh: Mesh, donate_state: bool = True
) -> Callable:
    """SPMD slab dispatch: scan ``per_step`` over a leading slab axis in ONE
    jitted program (Config.steps_per_dispatch — amortizes per-dispatch
    host/link latency that a step-at-a-time loop pays every step).

    ``per_step(state, local_batch, aux) -> (state, metrics)`` is the
    per-device step (built with axis_name=DATA_AXIS); ``aux`` is any
    replicated constant the body needs (e.g. the appearance stack the body
    gathers whole images from). Returns ``fn(state, xs, aux)`` where xs
    leaves are (slab, D, ...) host arrays sharded by ``put_global_slab``;
    metrics come back stacked (slab, ...).
    """

    def per_device(state, xs, aux):
        local = jax.tree.map(lambda x: x[:, 0], xs)  # drop device axis

        def body(st, b):
            return per_step(st, b, aux)

        return jax.lax.scan(body, state, local)

    mapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(None, DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate_state else ())


def put_global_slab(xs, mesh: Mesh):
    """Host (slab, D, ...) slab -> device arrays sharded over 'data' on the
    SECOND axis (the first is the scan axis). Multi-process semantics match
    put_global_batch: every process passes the same full slab."""
    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sh), xs)


def put_global_batch(batch, mesh: Mesh):
    """Host (D, ...) numpy batch -> device arrays sharded over 'data'.

    Multi-process: every process passes the SAME full global batch (cheap —
    the pipeline is a pure function of (epoch, step, device)) and
    ``device_put`` transfers only each process's addressable shards; no
    host-side scatter is needed (verified by tests/test_multiprocess.py)."""
    sh = data_sharded(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def put_replicated(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_render(system, mesh: Mesh, image_hw, tile=None) -> Callable:
    """Full-image eval render sharded over the mesh (SURVEY.md §5.7): rays
    split across devices, each renders its slice, per-ray features are
    all-gathered over ICI, and the style decode (global gram statistics)
    runs replicated — see render.system.forward_eval_sharded.

    Returns fn(variables, rays (h*w, 8), whole_img, key) -> results dict
    with full-image rgb/depth/mask (ray counts are padded to the mesh size
    internally)."""
    import jax.numpy as jnp

    from crnerf_tpu.render.system import forward_eval_sharded

    h, w = image_hw
    n_pix = h * w
    d = mesh.devices.size
    n_pad = -(-n_pix // d) * d

    def per_device(variables, rays, whole, key):
        batch = {"rays": rays, "whole_img": whole}
        return forward_eval_sharded(
            system, variables, batch, key, (h, w), n_pix, DATA_AXIS,
            tile=tile,
        )

    mapped = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    jfn = jax.jit(mapped)

    def fn(variables, rays, whole_img, key):
        rays = jnp.asarray(rays)
        if rays.shape[0] != n_pad:
            rays = jnp.pad(rays, ((0, n_pad - rays.shape[0]), (0, 0)))
        return jfn(variables, rays, jnp.asarray(whole_img), key)

    return fn
