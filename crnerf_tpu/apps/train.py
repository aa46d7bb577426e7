"""Training entry point (reference train_mask_grid_sample.py __main__,
SURVEY.md §3.1): config -> scene -> Trainer.fit with logging, checkpoints
and a code snapshot."""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax

from crnerf_tpu.apps import load_scene_from_config
from crnerf_tpu.config import get_config
from crnerf_tpu.train.loop import Trainer
from crnerf_tpu.utils.logging import MetricLogger, save_code


def main(argv: Optional[Sequence[str]] = None):
    if os.environ.get("CRNERF_MULTIHOST"):
        # multi-host pod: one process per host over DCN; the data mesh then
        # spans all processes (SURVEY.md §2.9 — the reference's multi-node
        # story was Lightning DDP; here it is jax.distributed + the same
        # shard_map train step)
        jax.distributed.initialize()
    from crnerf_tpu.utils.jit_cache import enable as enable_jit_cache

    enable_jit_cache()  # re-runs of an unchanged program skip the
    # 5-10 min TPU step compile (CRNERF_NO_JIT_CACHE=1 to opt out)
    cfg = get_config(argv)
    scene = load_scene_from_config(cfg, split="train")

    if jax.process_index() == 0:  # reference @rank_zero_only save_code
        save_code(
            cfg.save_dir, cfg.exp_name, cfg.to_json(),
        )
    # metric sink on process 0 only (reference: Lightning's rank-zero
    # WandbLogger); the Trainer treats logger=None as "don't log"
    logger = (
        MetricLogger(
            os.path.join(cfg.save_dir, "logs"), cfg.exp_name,
            use_wandb=cfg.use_wandb, project=cfg.proj_name,
        )
        if jax.process_index() == 0
        else None
    )
    # graceful preemption: SIGTERM/SIGINT checkpoints after the in-flight
    # step and exits cleanly; relaunching with --auto_resume (or the same
    # --ckpt_path) continues mid-epoch exactly (Trainer.request_stop).
    # Installed BEFORE the (minutes-long on TPU) Trainer construction so a
    # signal in that window still exits promptly. Single-process only: in
    # multi-process runs jax.distributed's preemption sync manager owns
    # SIGTERM and the Trainer polls the cross-process sync point every
    # step (Trainer._should_stop) — a per-process flag would desync the
    # collectives.
    import signal

    prev, holder = {}, {}

    def _graceful(signum, frame):
        t = holder.get("trainer")
        if t is not None and t.stopped:
            # second signal while a graceful stop is in flight (checked
            # FIRST — the stop's checkpoint may already have zeroed the
            # progress counter): the operator/scheduler means it — hard
            # exit with signal semantics, ctrl-C-twice style
            os._exit(128 + signum)
        if t is None or not t.has_unsaved_progress:
            # still building / compiling, or everything is already on
            # disk: exit NOW (os._exit — the main thread may be blocked
            # inside a minutes-long XLA compile where a Python-level
            # SystemExit wouldn't fire until it returns)
            os._exit(0)
        t.request_stop()

    if jax.process_count() == 1:
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev[sig] = signal.signal(sig, _graceful)
            except ValueError:  # not the main thread (embedded use)
                pass

    trainer = Trainer(cfg, scene, logger=logger)
    holder["trainer"] = trainer

    try:
        state = trainer.fit()
    finally:
        for sig, h in prev.items():
            if h is not None:  # None = non-Python handler; can't restore
                signal.signal(sig, h)
    if trainer.stopped:
        # a stop was requested: skip the (deadline-unsafe) extra
        # validation render even when training actually finished — the
        # checkpoint is saved either way
        if jax.process_index() == 0:
            step = int(jax.device_get(state.step))
            what = (
                "training complete; stop signal honored"
                if trainer.completed else "preempted"
            )
            print(f"{what}: checkpointed at step {step}")
    else:
        val = trainer.validate()
        if jax.process_index() == 0:
            print(
                f"final val: psnr={val['psnr']:.3f} ssim={val['ssim']:.4f}"
            )
    if logger is not None:
        logger.close()
    return state


if __name__ == "__main__":
    main()
