#!/usr/bin/env python
"""Anchor the PyTorch-baseline throughput estimate with hardware that IS
available: the reference trainer (torch CPU) vs the crnerf_tpu trainer
(XLA CPU) on the IDENTICAL full-size config and identical batches.

bench.py's `vs_baseline` divides by BASELINE_RAYS_PER_SEC = 20,000 — an
estimate of the reference's CUDA throughput (nothing is published,
BASELINE.md). This script measures the torch-step : XLA-CPU-step ratio on
the same machine, which pins how the two FRAMEWORKS compare per unit of
hardware and calibrates that estimate.

    python scripts/anchor_baseline.py --steps 3
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import convergence_parity as cp  # noqa: E402


def full_cfg():
    from crnerf_tpu.config import Config

    # the reference train.sh config, single grid (DDP rank-equivalent)
    return Config(
        batch_size=1024, N_samples=64, N_importance=64,
        netdepth=8, netwidth=256, nerf_out_dim=64,
        N_vocab=64, appearance_wh=(64, 48),
        encode_a=True, encode_c=True, use_mask=True, encode_random=False,
        perturb=0.0, noise_std=0.0,
        optimizer="adam", lr=5e-4, lr_scheduler="cosine", num_epochs=20,
        compute_dtype="float32", use_pallas=False, pallas_train=False,
        chunk=1 << 17,
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    assert jax.default_backend() == "cpu"
    import torch

    torch.manual_seed(7)
    n_timed = args.steps
    total = n_timed + 1  # first step is warmup/compile on both sides
    cfg = full_cfg()
    scene, pipe = cp.make_data(cfg, seed=0)
    batches = cp.batches_for(pipe, 1, total)

    mods, embeddings, ref_args = cp.build_torch_modules(cfg)
    sd = {}
    for prefix, m in mods.items():
        for k, v in m.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    from crnerf_tpu.utils.torch_port import convert_state_dict

    params, stats = convert_state_dict(sd, netdepth=cfg.netdepth)
    variables = jax.tree.map(
        np.array, {"params": params, "batch_stats": stats}
    )

    # one run_torch call over all batches; drop the first (warmup) step.
    # (a second run_torch call would be warm anyway, but keep both sides
    # structured identically: steps timed INSIDE a single trainer run)
    t0 = time.perf_counter()
    cp.run_torch(cfg, mods, embeddings, ref_args, batches[:1], total)
    torch_warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    cp.run_torch(cfg, mods, embeddings, ref_args, batches[1:], total)
    torch_s = (time.perf_counter() - t0) / n_timed

    # the jit lives INSIDE run_jax, so steps must be timed within ONE call
    # (a second run_jax call rebuilds the jit and would time a recompile,
    # not a warm step — that bug inflated an earlier BASELINE.md row)
    jax_times: list = []
    cp.run_jax(cfg, variables, batches, total, step_times=jax_times)
    jax_warm = jax_times[0]
    jax_s = sum(jax_times[1:]) / max(len(jax_times) - 1, 1)

    rays = cfg.batch_size
    print(f"torch reference step : {torch_s * 1e3:8.1f} ms "
          f"({rays / torch_s:8.0f} rays/s)  [warmup {torch_warm:.1f}s]")
    print(f"crnerf_tpu XLA-CPU   : {jax_s * 1e3:8.1f} ms "
          f"({rays / jax_s:8.0f} rays/s)  [compile+warmup {jax_warm:.1f}s]")
    print(f"framework ratio (torch/jax, same CPU): {torch_s / jax_s:.2f}x")


if __name__ == "__main__":
    main()
