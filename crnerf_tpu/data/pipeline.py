"""Host-side batch pipeline: Scene + GridSampler -> fixed-shape device batches.

Replaces the reference's DataLoader(+4 worker processes, batch_size=1,
epoch-global seeding — /root/reference/train_mask_grid_sample.py:254-259,
datasets/global_val.py) with a deterministic, thread-prefetched pipeline:

- every batch is a pure function of (epoch, idx, device) — no cross-process
  mutable epoch global (SURVEY.md §5.2 designs the race away),
- all arrays are fixed-shape so the train step compiles exactly once,
- data parallelism: a "global batch" stacks ``n_devices`` independent grids
  on a leading device axis, mirroring DDP's per-rank batches
  (SURVEY.md §2.9).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from crnerf_tpu.data.sampler import GridSampler
from crnerf_tpu.data.scene import Scene


class TrainPipeline:
    def __init__(
        self,
        scene: Scene,
        batch_size: int = 1024,
        scale_anneal: float = -1.0,
        min_scale: float = 0.5,
        seed_salt: int = 0,
    ):
        if scene.all_rays is None:
            scene.build_ray_buffers()
        self.scene = scene
        train = scene.train_images
        self.image_whs = np.asarray([im.wh for im in train], np.int64)
        self.image_ids = np.asarray([im.id for im in train], np.int64)
        self.sampler = GridSampler(
            n_images=len(train),
            image_whs=self.image_whs,
            offsets=scene.offsets,
            batch_size=batch_size,
            scale_anneal=scale_anneal,
            min_scale=min_scale,
            seed_salt=seed_salt,
        )
        self.batch_size = batch_size

    @property
    def iterations(self) -> int:
        return self.sampler.iterations

    def make_batch(self, epoch: int, idx: int) -> Dict[str, np.ndarray]:
        """One image-grid batch (reference __getitem__,
        phototourism…py:241-275). Keys: rays (B,8), ts (B,), rgbs (B,3),
        whole_img (1,Ha,Wa,3) in [-1,1], uv_pix (B,2), image_idx ()."""
        s = self.sampler.sample(epoch, idx)
        ray_rows = self.scene.all_rays[s["ray_idx"]]
        return {
            "rays": ray_rows[:, :8].astype(np.float32),
            "ts": ray_rows[:, 8].astype(np.int32),
            "rgbs": self.scene.all_rgbs[s["ray_idx"]].astype(np.float32),
            "whole_img": self.scene.appearance_stack[s["image_idx"]][None],
            "uv_pix": s["uv_pix"],
            "image_idx": np.int32(s["image_idx"]),
        }

    def make_batch_idx(self, epoch: int, idx: int) -> Dict[str, np.ndarray]:
        """Index-only form of ``make_batch`` for the device-resident slab
        mode (Config.slab_data='device'): the same sampler draw, but the
        host ships only (ray_idx, uv_pix, image_idx) — the scan body
        gathers the ray/ts/rgb rows from the HBM-resident buffers
        (train/loop.py), which is bitwise-identical to the host gather
        (same f32 rows, pure take)."""
        s = self.sampler.sample(epoch, idx)
        assert self.scene.offsets[-1] < 2**31, (
            "ray buffer exceeds int32 indexing; use slab_data='host'"
        )
        return {
            "ray_idx": s["ray_idx"].astype(np.int32),
            "uv_pix": s["uv_pix"],
            "image_idx": np.int32(s["image_idx"]),
        }

    def make_global_batch_idx(
        self, epoch: int, idx: int, n_devices: int
    ) -> Dict[str, np.ndarray]:
        """``make_global_batch`` for the index-only form (same round-robin
        draw order)."""
        parts = [
            self.make_batch_idx(epoch, idx * n_devices + d)
            for d in range(n_devices)
        ]
        return {
            k: np.stack([p[k] for p in parts], 0) for k in parts[0]
        }

    def make_global_batch(
        self, epoch: int, idx: int, n_devices: int
    ) -> Dict[str, np.ndarray]:
        """Stack n_devices independent grids on a leading axis (shard_map
        in-specs P('data', ...)). Device d at step idx consumes draw
        ``idx * n_devices + d`` so the global stream equals the single-device
        stream split round-robin."""
        parts = [
            self.make_batch(epoch, idx * n_devices + d)
            for d in range(n_devices)
        ]
        return {
            k: np.stack([p[k] for p in parts], 0) for k in parts[0]
        }

    def epoch_batches(
        self,
        epoch: int,
        n_devices: int = 1,
        prefetch: int = 2,
        n_steps: Optional[int] = None,
        grids_per_device: int = 1,
        start_step: int = 0,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Thread-prefetched global batches for one epoch. Host assembly
        (gather from the flat ray buffer) overlaps device compute —
        the TPU-native version of the reference's 4 DataLoader workers.

        Shapes: flat (B, ...) when n_devices == grids_per_device == 1;
        (G, B, ...) single-device multi-grid; (D, B...) multi-device; and
        (D, G, B, ...) for both.

        ``start_step`` skips the first batches of the epoch — batches are
        a pure function of (epoch, step), so a mid-epoch resume replays
        the exact remaining sequence (Trainer preemption recovery)."""
        g = max(1, grids_per_device)
        total = n_devices * g
        if n_steps is None:
            n_steps = max(1, self.iterations // max(1, total))
        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        stop = threading.Event()

        def producer():
            for i in range(start_step, n_steps):
                if stop.is_set():
                    return
                if total > 1:
                    b = self.make_global_batch(epoch, i, total)
                    if n_devices > 1 and g > 1:
                        b = {
                            k: v.reshape(n_devices, g, *v.shape[1:])
                            for k, v in b.items()
                        }
                else:
                    b = self.make_batch(epoch, i)
                q.put(b)
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is None:
                    return
                yield b
        finally:
            stop.set()
            # a consumer that breaks early (preemption stop) can leave the
            # producer blocked in q.put on the full queue, where it never
            # sees the stop Event — drain so it unblocks, re-checks stop,
            # and exits (otherwise each stopped fit() leaks a thread
            # pinning scene-sized batches)
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass


def full_image_batch(scene: Scene, image, appearance_img=None):
    """Whole-image eval batch (reference val/test_test split,
    phototourism…py:277-320): rays for every pixel + the image's own
    appearance input. ``appearance_img`` overrides the style source (the
    video demo's style-transfer path, appearance_modification_video.py)."""
    rays = scene.image_rays(image)
    app = appearance_img if appearance_img is not None else image.appearance
    return {
        "rays": rays.astype(np.float32),
        "ts": np.full((rays.shape[0],), image.id, np.int32),
        "rgbs": (
            image.rgbs.astype(np.float32)
            if image.rgbs is not None
            else np.zeros((rays.shape[0], 3), np.float32)
        ),
        "whole_img": app[None].astype(np.float32),
        "img_wh": np.asarray(image.wh, np.int64),
    }
