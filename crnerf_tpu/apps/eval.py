"""Render a dataset split to PNGs (reference eval.py, SURVEY.md §3.2).

Splits:
- ``test_test``: render every test image at its own resolution using its OWN
  appearance embedding (eval.py:271-283) — the input to the right-half
  metric protocol.
- ``test_train``: same over train images.
- ``test``: a parametric fov-60° camera path around a per-scene anchor pose
  with a fixed appearance source image (eval.py:131-268); writes PNGs + GIF.

Checkpoints: pass ``--ckpt_path`` as either a ``weights.npz`` inference
bundle or a training checkpoint directory containing one.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from crnerf_tpu.apps import load_scene_from_config
from crnerf_tpu.config import Config, get_config
from crnerf_tpu.render.camera_path import (
    PATH_PRESETS,
    fov_intrinsics,
    resolve_scene,
    test_path_rays,
)
from crnerf_tpu.render.inference import Renderer
from crnerf_tpu.utils.checkpoint import load_weights_only


def load_variables(ckpt_path: str):
    if ckpt_path.endswith(".npz"):
        return load_weights_only(ckpt_path)
    cand = os.path.join(ckpt_path, "weights.npz")
    if os.path.isdir(ckpt_path) and os.path.exists(cand):
        return load_weights_only(cand)
    raise FileNotFoundError(
        f"no inference bundle at {ckpt_path} (expected weights.npz; "
        "training writes one next to the orbax checkpoint)"
    )


def save_png(path: str, rgb01: np.ndarray):
    import imageio.v2 as imageio

    imageio.imwrite(
        path, (np.clip(rgb01, 0, 1) * 255).astype(np.uint8)
    )


def run(cfg: Config) -> str:
    variables = load_variables(cfg.ckpt_path)
    renderer = Renderer(cfg, variables)
    scene = load_scene_from_config(cfg, split=cfg.split)
    out_dir = os.path.join(
        cfg.save_dir, "results", cfg.dataset_name, cfg.scene_name
    )
    os.makedirs(out_dir, exist_ok=True)

    if cfg.split in ("test_test", "test_train", "val"):
        images = (
            scene.test_images
            if cfg.split == "test_test"
            else scene.train_images
        )
        if cfg.split == "val":
            images = images[:1]
        import time

        from crnerf_tpu.data.pipeline import full_image_batch

        frame_s = []
        for i, im in enumerate(images):
            b = full_image_batch(scene, im)
            w, h = im.wh
            t0 = time.perf_counter()
            out = renderer.render_frame(
                b["rays"][:, :8], b["whole_img"], (h, w)
            )
            frame_s.append(time.perf_counter() - t0)
            save_png(os.path.join(out_dir, f"{i:03d}.png"), out["rgb"])
        st = renderer.stats()
        med = sorted(frame_s)[len(frame_s) // 2] if frame_s else 0.0
        print(
            f"rendered {len(images)} images -> {out_dir} | "
            f"median {med:.3f} s/frame (first frame incl. compile "
            f"{frame_s[0]:.1f} s) | {st['programs']} compiled programs, "
            f"buckets={st['buckets']}"
        )
        return out_dir

    if cfg.split == "test":  # parametric camera path
        key = resolve_scene(cfg.scene_name)
        spec = PATH_PRESETS[key]
        train_imgs = scene.train_images
        style = train_imgs[
            min(spec.appearance_train_idx or 0, len(train_imgs) - 1)
        ]
        # pose anchor: a different image than the appearance source for
        # brandenburg (image id 1123) and sacre (train idx 99) —
        # eval.py:178,258; falls back to the style image on scenes that
        # lack the referenced id (e.g. the synthetic fixture)
        anchor = style
        if spec.pose_image_id is not None:
            by_id = [im for im in train_imgs if im.id == spec.pose_image_id]
            if by_id:
                anchor = by_id[0]
        elif spec.pose_train_idx is not None:
            if spec.pose_train_idx < len(train_imgs):
                anchor = train_imgs[spec.pose_train_idx]
        near, far = anchor.near, anchor.far
        if cfg.num_frames > 0:  # override the preset's 240-frame path
            import dataclasses

            spec = dataclasses.replace(spec, n_frames=cfg.num_frames)
        frames = []
        w, h = tuple(cfg.img_wh)
        for i, rays in enumerate(
            test_path_rays(spec, anchor.c2w, (w, h), near, far)
        ):
            out = renderer.render_frame(
                rays, style.appearance[None], (h, w)
            )
            save_png(os.path.join(out_dir, f"{i:03d}.png"), out["rgb"])
            frames.append(
                (np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8)
            )
        from crnerf_tpu.utils.visualization import write_video

        # gif-or-mp4 per --video_format (reference eval.py:301-304)
        write_video(
            os.path.join(out_dir, cfg.scene_name), frames,
            fmt=cfg.video_format,
        )
        print(f"rendered {len(frames)}-frame path -> {out_dir}")
        return out_dir

    raise ValueError(f"unsupported split {cfg.split!r}")


def main(argv: Optional[Sequence[str]] = None):
    from crnerf_tpu.utils.jit_cache import enable as enable_jit_cache

    enable_jit_cache()
    cfg = get_config(argv)
    return run(cfg)


if __name__ == "__main__":
    main()
