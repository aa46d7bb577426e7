"""Metric/experiment logging.

Reference: wandb via Lightning's WandbLogger with per-step scalars, periodic
image panels, and val means (/root/reference/train_mask_grid_sample.py:
291-297,299-335,404-417; SURVEY.md §5.5). Here the sink is pluggable:
JSONL is the default (offline, greppable, CI-friendly); wandb attaches when
the package is importable and ``use_wandb=True``. Metric *names* match the
reference ('train/loss', 'lr', 'val/psnr', 'val/ssim', ...) so dashboards
carry over.

``save_code`` mirrors the reference's reproducibility snapshot
(train…py:455-474): sources + full config into the experiment's log dir.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any, Dict, Optional

import numpy as np


class MetricLogger:
    def __init__(
        self,
        log_dir: str,
        exp_name: str = "exp",
        use_wandb: bool = False,
        project: str = "crnerf_tpu",
    ):
        self.log_dir = os.path.join(log_dir, exp_name)
        os.makedirs(self.log_dir, exist_ok=True)
        self.path = os.path.join(self.log_dir, "metrics.jsonl")
        self._fh = open(self.path, "a", buffering=1)
        self.wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore

                self.wandb = wandb
                wandb.init(project=project, name=exp_name, dir=self.log_dir)
            except Exception:
                self.wandb = None  # offline environments: JSONL only

    def log(self, metrics: Dict[str, Any], step: int):
        row = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                row[k] = float(np.asarray(v))
            except Exception:
                row[k] = str(v)
        self._fh.write(json.dumps(row) + "\n")
        if self.wandb is not None:
            self.wandb.log(
                {k: v for k, v in row.items() if k not in ("step", "time")},
                step=step,
            )

    def log_image(self, name: str, img, step: int):
        """img: (H, W, 3) float [0,1] -> PNG under images/."""
        import imageio.v2 as imageio

        d = os.path.join(self.log_dir, "images")
        os.makedirs(d, exist_ok=True)
        arr = np.clip(np.asarray(img), 0, 1)
        imageio.imwrite(
            os.path.join(d, f"{name.replace('/', '_')}_{step:08d}.png"),
            (arr * 255).astype(np.uint8),
        )

    def close(self):
        self._fh.close()
        if self.wandb is not None:
            self.wandb.finish()


def save_code(save_dir: str, exp_name: str, config_json: str,
              repo_root: Optional[str] = None):
    """Snapshot the package sources + the full config into
    ``{save_dir}/logs/{exp_name}/codes`` (reference save_code,
    train…py:455-474). Only rank 0 should call this
    (jax.process_index() == 0)."""
    repo_root = repo_root or os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    dst = os.path.join(save_dir, "logs", exp_name, "codes")
    os.makedirs(dst, exist_ok=True)
    src_pkg = os.path.join(repo_root, "crnerf_tpu")
    if os.path.isdir(src_pkg):
        shutil.copytree(
            src_pkg,
            os.path.join(dst, "crnerf_tpu"),
            dirs_exist_ok=True,
            ignore=shutil.ignore_patterns("__pycache__"),
        )
    with open(os.path.join(dst, "config.json"), "w") as f:
        f.write(config_json)
