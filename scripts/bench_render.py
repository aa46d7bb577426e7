"""Full-frame inference benchmark: sec/frame at the eval protocol's
sampling config (N_samples=256, N_importance=256 — reference
command/test.sh:22), comparing the XLA renderer against the fused Pallas
render kernel.

Marginal timing (BASELINE.md methodology): time K frames and 2K frames
inside jitted lax.scan-free loops with a scalar fetch, report the
difference — cancels the tunnel's fixed dispatch/fetch cost.

Usage: python scripts/bench_render.py [--wh 320 240] [--n 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from crnerf_tpu.utils.jit_cache import enable as _ejc
    _ejc()
    ap = argparse.ArgumentParser()
    ap.add_argument("--wh", type=int, nargs=2, default=(320, 240))
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from crnerf_tpu.config import Config
    from crnerf_tpu.render.system import CrNerfSystem

    w, h = args.wh
    on_tpu = jax.devices()[0].platform != "cpu"

    def build(use_pallas: bool):
        cfg = Config(
            N_samples=args.n, N_importance=args.n,
            appearance_wh=(224, 160) if on_tpu else (64, 48),
            compute_dtype="bfloat16",
            use_pallas=use_pallas,
            val_chunk=args.chunk,
        )
        system = CrNerfSystem(cfg)
        variables = system.init(jax.random.PRNGKey(0))
        return cfg, system, variables

    # one frame's rays
    o = np.zeros((h * w, 3), np.float32)
    d = np.stack(
        np.meshgrid(np.linspace(-0.4, 0.4, w), np.linspace(-0.3, 0.3, h)),
        -1,
    ).reshape(-1, 2)
    dirs = np.concatenate([d, np.ones((h * w, 1), np.float32)], -1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, dirs.astype(np.float32),
         np.full((h * w, 1), 0.5, np.float32),
         np.full((h * w, 1), 5.0, np.float32)], -1,
    )

    for use_pallas in (False, True):
        cfg, system, variables = build(use_pallas)
        wa, ha = cfg.appearance_wh
        batch = {
            "rays": jnp.asarray(rays),
            "whole_img": jnp.zeros((1, ha, wa, 3)),
        }

        @jax.jit
        def frame(variables, batch, key):
            results, _ = system.forward(
                variables, batch, key, train=False, tile=cfg.val_chunk,
                image_hw=(h, w),
            )
            return results["rgb_fine"].sum()

        def run(k):
            t0 = time.perf_counter()
            acc = 0.0
            for i in range(k):
                acc += float(frame(variables, batch,
                                   jax.random.PRNGKey(i)))
            return time.perf_counter() - t0

        run(1)  # compile
        t1 = run(2)
        t2 = run(4)
        per_frame = (t2 - t1) / 2
        label = "pallas-fused" if use_pallas else "xla"
        print(f"{label:13s}: {per_frame:.3f} s/frame "
              f"({w}x{h}, N={args.n}+{args.n}, chunk={cfg.val_chunk})")

    # ---- HEAD-default eval path: fused Pallas THROUGH the pow2 ray
    # bucket (render/inference.py — padded rays, masked style stats);
    # this is what apps/eval actually runs, so it gets its own row
    from crnerf_tpu.render.inference import Renderer, bucket_size

    cfg, system, variables = build(True)
    wa, ha = cfg.appearance_wh
    r = Renderer(cfg, variables, system)
    n_pix = h * w
    p = bucket_size(n_pix)
    rays_p = np.pad(rays, ((0, p - n_pix), (0, 0)), mode="edge")
    vv, uu = np.meshgrid(
        (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w, indexing="ij"
    )
    uv = np.stack([vv.reshape(-1), uu.reshape(-1)], -1).astype(np.float32)
    uv_p = jnp.asarray(np.pad(uv, ((0, p - n_pix), (0, 0)), mode="edge"))
    rays_b = jnp.asarray(rays_p)
    whole = jnp.zeros((1, ha, wa, 3))
    fn = r._fn_bucketed(p)

    def run_bucket(k):
        t0 = time.perf_counter()
        acc = 0.0
        for i in range(k):
            out = fn(variables, rays_b, whole, uv_p, jnp.int32(n_pix),
                     jax.random.PRNGKey(i))
            acc += float(out["rgb_fine"].sum())
        return time.perf_counter() - t0

    run_bucket(1)
    t1 = run_bucket(2)
    t2 = run_bucket(4)
    # the bucketed Renderer tiles by cfg.chunk (production default 8192),
    # NOT by val_chunk — label the tile it actually ran
    print(f"pallas-bucket: {(t2 - t1) / 2:.3f} s/frame "
          f"({w}x{h} padded to {p}-ray bucket, N={args.n}+{args.n}, "
          f"chunk={min(cfg.chunk, p)})")


if __name__ == "__main__":
    main()
