"""Cache builder (reference prepare_phototourism.py:19-60): run COLMAP
parsing + image decode once, serialize the Scene to one npz; training then
skips straight to ray buffers."""

from __future__ import annotations

import argparse
import time
from typing import Optional, Sequence

from crnerf_tpu.data.phototourism import load_phototourism, save_scene_cache


def main(argv: Optional[Sequence[str]] = None):
    p = argparse.ArgumentParser(description="build phototourism scene cache")
    p.add_argument("--root_dir", type=str, required=True)
    p.add_argument("--img_downscale", type=int, default=1)
    p.add_argument("--appearance_wh", nargs=2, type=int,
                   default=[224, 160])
    args = p.parse_args(argv)

    t0 = time.time()
    scene = load_phototourism(
        args.root_dir,
        img_downscale=args.img_downscale,
        appearance_wh=tuple(args.appearance_wh),
        use_cache=False,
    )
    path = save_scene_cache(
        scene, root_dir=args.root_dir, img_downscale=args.img_downscale
    )
    n_train = len(scene.train_images)
    print(
        f"cached {scene.name}: {n_train} train / "
        f"{len(scene.test_images)} test images -> {path} "
        f"({time.time() - t0:.1f}s)"
    )


if __name__ == "__main__":
    main()
