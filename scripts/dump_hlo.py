"""Dump the optimized HLO of the train step and print source metadata for
named ops (to attribute profiler entries like `gather.64` to code lines).

Usage: python scripts/dump_hlo.py [--ops gather.64 pad.331 ...] [--xla]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", nargs="*", default=[])
    ap.add_argument("--xla", action="store_true")
    ap.add_argument("--grids", type=int, default=16)
    ap.add_argument("--out", default="/tmp/train_step_hlo.txt")
    args = ap.parse_args()

    import jax

    from crnerf_tpu.config import Config
    from crnerf_tpu.data import TrainPipeline, make_synthetic_scene
    from crnerf_tpu.render.system import CrNerfSystem
    from crnerf_tpu.train.optim import make_optimizer
    from crnerf_tpu.train.state import TrainState
    from crnerf_tpu.train.step import make_train_step

    on_tpu = jax.devices()[0].platform != "cpu"
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
    batch = pipe.make_global_batch(0, 0, args.grids)
    compiled = step.lower(state, batch).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {args.out}")

    for op in args.ops:
        pat = re.compile(r"^\s*%?" + re.escape(op) + r"\s*=.*$", re.M)
        for m in pat.finditer(txt):
            line = m.group(0)
            print("\n====", op)
            print(line[:2000])


if __name__ == "__main__":
    main()
