"""Score saved renders against ground truth (reference eval_metric.py:50-116).

Protocol (SURVEY.md §6): PSNR / SSIM(window=3) / LPIPS-alex / MSE computed on
the RIGHT HALF of each test image (``[:, w//2:]`` — eval_metric.py:89-93;
the left half was visible through the appearance encoder at train time).
Appends a summary line to ``result.txt``.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Sequence

import numpy as np

import jax.numpy as jnp

from crnerf_tpu.train.metrics import mse as mse_fn, psnr as psnr_fn, ssim as ssim_fn


def score_pair(pred01: np.ndarray, gt01: np.ndarray, lpips_fn=None):
    """pred/gt: (h, w, 3) float [0,1]. Right-half protocol."""
    w = pred01.shape[1]
    pred = jnp.asarray(pred01[:, w // 2:])
    gt = jnp.asarray(gt01[:, w // 2:])
    out = {
        "psnr": float(psnr_fn(pred, gt)),
        "ssim": float(ssim_fn(pred, gt)),
        "mse": float(mse_fn(pred, gt)),
    }
    if lpips_fn is not None:
        out["lpips"] = float(lpips_fn(np.asarray(pred), np.asarray(gt)))
    return out


def main(argv: Optional[Sequence[str]] = None):
    p = argparse.ArgumentParser(description="score saved renders")
    p.add_argument("--root_dir", type=str, required=True)
    p.add_argument("--dataset_name", type=str, default="phototourism")
    p.add_argument("--scene_name", type=str, default="scene")
    p.add_argument("--save_dir", type=str, default="./results")
    p.add_argument("--img_downscale", type=int, default=2)
    p.add_argument("--split", type=str, default="test_test")
    args = p.parse_args(argv)

    from crnerf_tpu.apps import load_scene_from_config
    from crnerf_tpu.config import Config

    cfg = Config(
        root_dir=args.root_dir,
        dataset_name=args.dataset_name,
        scene_name=args.scene_name,
        img_downscale=args.img_downscale,
        split=args.split,
    )
    scene = load_scene_from_config(cfg, split=args.split)
    images = (
        scene.test_images if args.split == "test_test"
        else scene.train_images
    )
    render_dir = os.path.join(
        args.save_dir, "results", args.dataset_name, args.scene_name
    )

    lpips_fn = None
    try:
        from crnerf_tpu.eval.lpips import LpipsAlex

        lpips_fn = LpipsAlex()
    except Exception as e:  # torchvision weights unavailable offline
        print(f"lpips unavailable ({e}); reporting psnr/ssim/mse only")

    import imageio.v2 as imageio

    rows = []
    missing = []
    for i, im in enumerate(images):
        path = os.path.join(render_dir, f"{i:03d}.png")
        if not os.path.exists(path):
            missing.append(os.path.basename(path))
            continue
        pred = np.asarray(imageio.imread(path), np.float32) / 255.0
        w, h = im.wh
        gt = im.rgbs.reshape(h, w, 3)
        rows.append(score_pair(pred, gt, lpips_fn))

    if missing:
        # fail loudly: a half-finished render dir must not score as a
        # healthy mean (the reference iterates the dataset directly, so a
        # missing frame would crash it — eval_metric.py:72-88)
        raise FileNotFoundError(
            f"{render_dir}: expected {len(images)} renders, found "
            f"{len(rows)}; missing {missing[:10]}"
            + ("..." if len(missing) > 10 else "")
        )
    if not rows:
        raise FileNotFoundError(f"no renders found under {render_dir}")
    mean = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    line = (
        f"{args.scene_name} n={len(rows)} "
        + " ".join(f"{k}={v:.4f}" for k, v in mean.items())
    )
    print(line)
    with open(os.path.join(render_dir, "result.txt"), "a") as f:
        f.write(line + "\n")
    return mean


if __name__ == "__main__":
    main()
