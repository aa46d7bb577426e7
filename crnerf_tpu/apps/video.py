"""Appearance-hallucination video demo (reference
appearance_modification_video.py, SURVEY.md §3.3): for each style image in a
folder, encode its appearance, render a 240-frame camera path around the
scene anchor, decode every frame with that style, and write PNGs + a 30 fps
GIF (or mp4).

Like the reference demo this needs no COLMAP data — anchor poses are
built-in per scene (DEMO_ANCHORS) and near/far is the demo-standard 0/5
(/root/reference/datasets/PhototourismDataset.py:14-16). Sampling defaults to
the demo's heavy 256+256 (appearance…video.py:47-50).
"""

from __future__ import annotations

import argparse
import glob
import os
from typing import Optional, Sequence

import numpy as np

from crnerf_tpu.config import Config
from crnerf_tpu.render.camera_path import (
    DEMO_ANCHORS,
    PATH_PRESETS,
    resolve_scene,
    test_path_rays,
)
from crnerf_tpu.render.inference import Renderer


def _load_style(path: str, appearance_wh) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB").resize(
        tuple(appearance_wh), Image.LANCZOS
    )
    return (
        np.asarray(img, np.float32) / 255.0 * 2.0 - 1.0
    )[None]  # (1, Ha, Wa, 3) in [-1,1]


def main(argv: Optional[Sequence[str]] = None):
    from crnerf_tpu.utils.jit_cache import enable as enable_jit_cache

    enable_jit_cache()
    p = argparse.ArgumentParser(description="appearance-hallucination video")
    p.add_argument("--ckpt_path", type=str, required=True)
    p.add_argument("--scene_name", type=str, required=True)
    p.add_argument("--style_dir", type=str, required=True,
                   help="folder of style images (reference images/artworks)")
    p.add_argument("--save_dir", type=str, default="./results")
    p.add_argument("--img_wh", nargs=2, type=int, default=[320, 240])
    p.add_argument("--N_samples", type=int, default=256)
    p.add_argument("--N_importance", type=int, default=256)
    p.add_argument("--chunk", type=int, default=8192)
    p.add_argument("--n_frames", type=int, default=240)
    # architecture knobs must match the checkpoint
    p.add_argument("--netdepth", type=int, default=8)
    p.add_argument("--netwidth", type=int, default=256)
    p.add_argument("--nerf_out_dim", type=int, default=64)
    p.add_argument("--appearance_wh", nargs=2, type=int,
                   default=[224, 160])
    p.add_argument("--video_format", choices=["gif", "mp4"], default="gif")
    args = p.parse_args(argv)

    from crnerf_tpu.apps.eval import load_variables, save_png

    cfg = Config(
        scene_name=args.scene_name,
        N_samples=args.N_samples,
        N_importance=args.N_importance,
        chunk=args.chunk,
        appearance_wh=tuple(args.appearance_wh),
        netdepth=args.netdepth,
        netwidth=args.netwidth,
        nerf_out_dim=args.nerf_out_dim,
        use_mask=False,  # demo decodes style only (appearance…video.py)
        encode_random=False,
    )
    variables = load_variables(args.ckpt_path)
    # multi-device hosts shard the bucketed render over a data mesh
    # (same production path as apps/eval — render/inference.py)
    import jax

    mesh = None
    if len(jax.devices()) > 1:
        from crnerf_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(0)
    renderer = Renderer(cfg, variables, mesh=mesh)

    scene_key = resolve_scene(args.scene_name)
    spec = PATH_PRESETS[scene_key]
    anchor = DEMO_ANCHORS.get(scene_key)
    if anchor is None:
        raise KeyError(f"no demo anchor pose for {scene_key}")
    spec = type(spec)(**{
        **{f.name: getattr(spec, f.name)
           for f in spec.__dataclass_fields__.values()},
        "n_frames": args.n_frames,
    })

    import imageio.v2 as imageio

    w, h = args.img_wh
    styles = sorted(
        glob.glob(os.path.join(args.style_dir, "*"))
    )
    for style_path in styles:
        name = os.path.splitext(os.path.basename(style_path))[0]
        out_dir = os.path.join(
            args.save_dir, "video", args.scene_name, name
        )
        os.makedirs(out_dir, exist_ok=True)
        style = _load_style(style_path, args.appearance_wh)
        # pipelined u8 frames (apps/eval.py pattern: overlap host
        # fetch/PNG-write with device compute of the next frame)
        depth = max(1, getattr(renderer.cfg, "eval_pipeline", 2))
        pending, by_idx = [], {}

        def _drain():
            i, hnd = pending.pop(0)
            u8 = renderer.fetch(hnd)["rgb_u8"]
            save_png(os.path.join(out_dir, f"{i:03d}.png"), u8)
            by_idx[i] = u8

        if getattr(renderer.cfg, "cam_rays", True) and getattr(
            renderer.cfg, "eval_bucket", True
        ):
            # pose-only dispatch: the style is staged once as a device
            # array; rays are generated in the bucketed program
            import jax.numpy as jnp

            from crnerf_tpu.render.camera_path import fov_intrinsics

            style_dev = jnp.asarray(np.asarray(style, np.float32))
            K = fov_intrinsics((w, h))
            for i, c2w in enumerate(spec.poses(anchor)):
                pending.append((
                    i,
                    renderer.render_frame_cam_async(
                        c2w, K, 0.0, 5.0, (h, w), style_dev,
                        outputs="rgb_u8",
                    ),
                ))
                while len(pending) >= depth:
                    _drain()
        else:
            for i, rays in enumerate(
                test_path_rays(spec, anchor, (w, h), near=0.0, far=5.0)
            ):
                pending.append((
                    i,
                    renderer.render_frame_async(
                        rays, style, (h, w), outputs="rgb_u8"
                    ),
                ))
                while len(pending) >= depth:
                    _drain()
        while pending:
            _drain()
        frames = [by_idx[i] for i in sorted(by_idx)]
        from crnerf_tpu.utils.visualization import write_video

        write_video(os.path.join(out_dir, name), frames,
                    fmt=args.video_format)
        print(f"{name}: {len(frames)} frames -> {out_dir}")


if __name__ == "__main__":
    main()
