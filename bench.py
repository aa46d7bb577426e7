"""Headline benchmark: train-step throughput (rays/sec/chip) on the full
CR-NeRF config (8x256 coarse+fine MLPs, 64+64 samples/ray, style head,
CGNet mask, batch 1024 — /root/reference/command/train.sh:24).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline normalizes against BASELINE_RAYS_PER_SEC, an estimate of the
PyTorch-CUDA reference's train throughput (the repo/paper publish no
throughput — SURVEY.md §6; estimate: reference trains ~5 steps/s x 1024
rays on a modern CUDA GPU). BASELINE.md tracks this assumption.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 20_000.0  # estimated PyTorch-CUDA reference
WARMUP = 3
STEPS = 30


def main():
    import jax

    on_tpu = jax.devices()[0].platform != "cpu"

    from crnerf_tpu.config import Config
    from crnerf_tpu.data import TrainPipeline, make_synthetic_scene
    from crnerf_tpu.render.system import CrNerfSystem
    from crnerf_tpu.train.optim import make_optimizer
    from crnerf_tpu.train.state import TrainState
    from crnerf_tpu.train.step import make_train_step

    if on_tpu:
        cfg = Config(
            appearance_wh=(224, 160),
            compute_dtype="bfloat16",
            grids_per_step=16,  # reference --num_gpus 16 semantics on one
            # chip; G=32 exceeds v5e HBM (measured 2026-08-16)
        )
    else:  # CI fallback so the line always prints
        cfg = Config(
            batch_size=256, N_samples=16, N_importance=16,
            netdepth=4, netwidth=64, nerf_out_dim=32, N_vocab=16,
            appearance_wh=(64, 48),
        )

    wa, ha = cfg.appearance_wh
    scene = make_synthetic_scene(
        n_train=4, n_test=1, img_wh=(112, 84), appearance_wh=(wa, ha)
    )
    pipe = TrainPipeline(scene, batch_size=cfg.batch_size)
    system = CrNerfSystem(cfg)

    variables = system.init(jax.random.PRNGKey(0))
    tx, sched = make_optimizer(cfg, pipe.iterations)
    state = TrainState.create(
        variables,
        tx.init(variables["params"]),
        n_vocab=cfg.N_vocab,
        embed_hw=32,
        embed_c=cfg.nerf_out_dim,
        rng=jax.random.PRNGKey(1),
    )
    grids = max(1, cfg.grids_per_step)
    step_fn = jax.jit(
        make_train_step(system, tx, sched, grids_per_step=grids),
        donate_argnums=(0,),
    )

    if grids > 1:
        batches = [
            jax.tree.map(
                np.asarray, pipe.make_global_batch(0, i, grids)
            )
            for i in range(8)
        ]
    else:
        batches = [
            jax.tree.map(np.asarray, pipe.make_batch(0, i))
            for i in range(8)
        ]
    for i in range(WARMUP):
        state, metrics = step_fn(state, batches[i % len(batches)])
    jax.block_until_ready(metrics)

    # steps chain through the donated state -> genuinely sequential on
    # device (independent-call timing is unreliable through the TPU tunnel)
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = step_fn(state, batches[i % len(batches)])
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    rays_per_sec = cfg.batch_size * grids * STEPS / dt
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
