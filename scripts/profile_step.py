"""Profile the full train step on the current backend and print an
op-level time breakdown.

Runs the same configuration as bench.py (G=16 grids/step, bf16, Pallas
train kernels on TPU), captures a jax.profiler trace of a few steps, then
aggregates the Perfetto trace's device-track slices by op name.

Usage:  python scripts/profile_step.py [--steps 3] [--xla] [--top 40]

--eval profiles the production INFERENCE path instead (the bucketed
full-frame render apps/eval.py runs — render/inference.py), at the eval
protocol's 320x240 / N=256+256 shapes; "step" then means one frame.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from crnerf_tpu.utils.jit_cache import enable as _ejc
    _ejc()
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--xla", action="store_true",
                    help="profile the pure-XLA path instead of Pallas")
    ap.add_argument("--grids", type=int, default=16)
    ap.add_argument("--eval", action="store_true",
                    help="profile the bucketed full-frame INFERENCE path "
                         "(render/inference.py) instead of the train step")
    ap.add_argument("--wh", type=int, nargs=2, default=(320, 240),
                    help="--eval frame size")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from crnerf_tpu.config import Config
    from crnerf_tpu.data import TrainPipeline, make_synthetic_scene
    from crnerf_tpu.render.system import CrNerfSystem
    from crnerf_tpu.train.optim import make_optimizer
    from crnerf_tpu.train.state import TrainState
    from crnerf_tpu.train.step import make_train_step

    on_tpu = jax.devices()[0].platform != "cpu"

    if args.eval:
        import numpy as np

        from crnerf_tpu.render.inference import Renderer, bucket_size

        cfg = Config(
            N_samples=256, N_importance=256,
            appearance_wh=(224, 160) if on_tpu else (64, 48),
            compute_dtype="bfloat16",
            use_pallas=on_tpu and not args.xla,
        )
        system = CrNerfSystem(cfg)
        variables = system.init(jax.random.PRNGKey(0))
        r = Renderer(cfg, variables, system)
        w, h = args.wh
        n_pix = h * w
        p = bucket_size(n_pix)
        o = np.zeros((n_pix, 3), np.float32)
        d2 = np.stack(
            np.meshgrid(np.linspace(-0.4, 0.4, w),
                        np.linspace(-0.3, 0.3, h)), -1,
        ).reshape(-1, 2)
        dirs = np.concatenate([d2, np.ones((n_pix, 1), np.float32)], -1)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        rays = np.concatenate(
            [o, dirs.astype(np.float32),
             np.full((n_pix, 1), 0.5, np.float32),
             np.full((n_pix, 1), 5.0, np.float32)], -1,
        )
        rays_b = jnp.asarray(np.pad(rays, ((0, p - n_pix), (0, 0)),
                                    mode="edge"))
        vv, uu = np.meshgrid((np.arange(h) + 0.5) / h,
                             (np.arange(w) + 0.5) / w, indexing="ij")
        uv = np.stack([vv.reshape(-1), uu.reshape(-1)], -1)
        uv_p = jnp.asarray(np.pad(uv.astype(np.float32),
                                  ((0, p - n_pix), (0, 0)), mode="edge"))
        wa, ha = cfg.appearance_wh
        whole = jnp.zeros((1, ha, wa, 3))
        fn = r._fn_bucketed(p)

        def step(_state, _batch):
            out = fn(variables, rays_b, whole, uv_p, jnp.int32(n_pix),
                     jax.random.PRNGKey(0))
            return _state, {"loss": out["rgb_fine"].sum()}

        state, batch = None, None
    else:
        cfg = Config(
            appearance_wh=(224, 160) if on_tpu else (64, 48),
            compute_dtype="bfloat16",
            grids_per_step=args.grids,
            pallas_train=on_tpu and not args.xla,
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
            variables, tx.init(variables["params"]),
            n_vocab=cfg.N_vocab, embed_hw=32, embed_c=cfg.nerf_out_dim,
            rng=jax.random.PRNGKey(1),
        )
        step = jax.jit(
            make_train_step(system, tx, sched, grids_per_step=args.grids,
                            grad_accum_chunks=cfg.resolved_chunks()),
            donate_argnums=0,
        )
        batch = jax.device_put(pipe.make_global_batch(0, 0, args.grids))

    # warm up compile + one execution
    state, m = step(state, batch)
    float(m["loss"])

    tmp = tempfile.mkdtemp(prefix="crnerf_prof_")
    jax.profiler.start_trace(tmp)
    for _ in range(args.steps):
        state, m = step(state, batch)
    float(m["loss"])
    jax.profiler.stop_trace()

    traces = glob.glob(
        os.path.join(tmp, "**", "*.trace.json.gz"), recursive=True
    )
    if not traces:
        print("no trace captured (remote tunnel?) — dir:", tmp)
        return
    with gzip.open(sorted(traces)[-1], "rt") as f:
        data = json.load(f)

    events = data.get("traceEvents", [])
    # find device-track pids (TPU / device XLA ops tracks)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "/device:" in n or "Device" in n
    }

    tot = collections.Counter()
    cnt = collections.Counter()
    wall = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        tot[name] += dur
        cnt[name] += 1
        wall += dur

    n_steps = max(args.steps, 1)
    print(f"device busy time: {wall / 1e3 / n_steps:.2f} ms/step "
          f"(over {n_steps} steps)\n")
    print(f"{'us/step':>10}  {'count':>6}  op")
    for name, us in tot.most_common(args.top):
        print(f"{us / n_steps:>10.0f}  {cnt[name] // n_steps:>6}  "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
