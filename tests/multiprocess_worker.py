"""Subprocess entry for tests/test_multiprocess.py: one process of a
2-process jax.distributed CPU run driving the REAL Trainer end-to-end.

This is the TPU-native answer to the reference's untested multi-GPU DDP
(/root/reference/train_mask_grid_sample.py:445-447, SURVEY.md §2.9/§4):
each process owns 2 virtual CPU devices, `make_mesh` spans all 4 global
devices, batches are materialized identically on every process (the
pipeline is a pure function of (epoch, step, device)) and `device_put`
ships only the addressable shards. The run exercises:

- shard_map training over a mesh that crosses a process boundary
  (gradient psum + embedding-cache all_gather over "DCN"),
- orbax checkpointing with process_count > 1 (collective save; primary
  host writes) and a fresh-Trainer restore on all processes,
- the sharded full-image validation render (features all-gathered),
- process-0-only metric logging / weights.npz export.

Writes a JSON result (params digest, val metrics, restored step) consumed
by the asserting test.
"""

import argparse
import hashlib
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--process_id", type=int, required=True)
    p.add_argument("--num_processes", type=int, required=True)
    p.add_argument("--save_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--local_devices", type=int, default=2)
    p.add_argument("--preempt_at", type=int, default=0,
                   help="after N steps, the --preempt_rank process "
                        "SIGTERMs itself — the cluster-style preemption "
                        "notice; jax's sync manager propagates it and ALL "
                        "processes must stop at the same agreed step")
    p.add_argument("--preempt_rank", type=int, default=0,
                   help="which process receives the SIGTERM")
    p.add_argument("--grids_per_step", type=int, default=1,
                   help="G grids per DEVICE (reference --num_gpus "
                        "semantics folded per device, train/step.py)")
    p.add_argument("--steps_per_dispatch", type=int, default=0,
                   help="> 1: slab dispatch through shard_train_scan "
                        "(the production-recommended feeding mode, "
                        "proven here under jax.distributed). With "
                        "--preempt_at N the SIGTERM lands after N "
                        "DISPATCHES (slabs), not steps")
    p.add_argument("--val_every_epochs", type=int, default=1,
                   help="Config.val_every_epochs (0 trims the val-render "
                        "compile from legs that don't target it)")
    a = p.parse_args()

    # Platform pinning must precede the first backend init (see
    # tests/conftest.py for why the env var alone is not enough here).
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={a.local_devices}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    # Deliberately NO persistent jit cache here: jax only WRITES cache
    # entries from process 0, so on repeat runs rank 0 loads its programs
    # in seconds while every other rank recompiles for minutes. That
    # asymmetric skew at the first collective execution blows Gloo's
    # hardcoded 30 s KV-store timeout ("Gloo context initialization
    # failed: DEADLINE_EXCEEDED") and kills the run. Symmetric cold
    # compiles keep the ranks within scheduler-fairness skew of each
    # other, which the pre-Trainer barrier below plus Gloo's window
    # absorb.
    jax.distributed.initialize(
        coordinator_address=a.coordinator,
        num_processes=a.num_processes,
        process_id=a.process_id,
        # CI hosts can be as small as ONE core: 2-4 workers serialize
        # their 1-4 min compiles on it, so a peer legitimately falls
        # >5 min behind (jax defaults: heartbeat 100 s, shutdown barrier
        # 300 s) and the default barriers kill the healthy run — seen as
        # "Shutdown barrier has failed ... 1/2 reached". The runner's
        # communicate(timeout=1200) stays the real watchdog.
        initialization_timeout=600,
        heartbeat_timeout_seconds=600,
        shutdown_timeout_seconds=1100,
    )
    assert jax.process_count() == a.num_processes
    assert len(jax.local_devices()) == a.local_devices
    assert len(jax.devices()) == a.num_processes * a.local_devices

    import numpy as np

    from crnerf_tpu.config import Config
    from crnerf_tpu.data import make_synthetic_scene
    from crnerf_tpu.train.loop import Trainer
    from crnerf_tpu.utils.logging import MetricLogger

    cfg = Config(
        batch_size=16, N_samples=4, N_importance=4, netdepth=2,
        netwidth=16, nerf_out_dim=8, N_vocab=10, appearance_wh=(32, 24),
        chunk=256, num_epochs=50 if a.preempt_at else 1, lr=5e-4,
        grids_per_step=a.grids_per_step,
        steps_per_dispatch=a.steps_per_dispatch,
        val_every_epochs=a.val_every_epochs,
        save_dir=a.save_dir,
        exp_name="mp", log_every=1, dataset_name="synthetic",
        num_devices=0,  # all 4 global devices -> mesh crosses processes
    )
    scene = make_synthetic_scene(
        appearance_wh=(32, 24), img_wh=(24, 18), n_train=2, n_test=1
    )
    # metric sink on process 0 only (mirrors apps/train.py)
    logger = (
        MetricLogger(os.path.join(a.save_dir, "logs"), cfg.exp_name)
        if jax.process_index() == 0
        else None
    )
    # Align the processes BEFORE the first collective. Worker startup
    # (imports, scene synth) is heavily skewed when CI serializes the
    # workers on few cores, and the first cross-process collective fires
    # already inside Trainer.__init__ (device_put's multihost
    # assert_equal all-gather): a fast worker reaching it while a slow
    # one is still importing dies on Gloo's hardcoded 30 s communicator
    # KV timeout. This barrier rides the coordination service (generous
    # timeouts); past it, every program's compile starts simultaneously
    # on all processes and collectives keep later steps aligned.
    try:  # guarded private API (mirrors utils/jit_cache.py): a JAX bump
        # must degrade to "no extra barrier" (Gloo's own timeouts then
        # absorb the startup skew), not an obscure ImportError
        from jax._src import distributed as _dist

        client = getattr(_dist.global_state, "client", None)
        if client is not None:
            client.wait_at_barrier("pre_trainer", timeout_in_ms=900_000)
    except Exception as e:  # pragma: no cover - depends on jax version
        print(f"pre_trainer barrier unavailable ({e}); relying on "
              "collective timeouts", flush=True)
    tr = Trainer(cfg, scene, logger=logger)
    if a.preempt_at:
        import signal

        seen = {"n": 0}

        def _notice():
            seen["n"] += 1
            if a.process_id == a.preempt_rank and seen["n"] == a.preempt_at:
                os.kill(os.getpid(), signal.SIGTERM)

        if a.steps_per_dispatch > 1:
            orig_scan = tr.scan_fn

            def scan_then_notice(state, xs, aux):
                out = orig_scan(state, xs, aux)
                _notice()
                return out

            tr.scan_fn = scan_then_notice
        else:
            orig_step = tr.step_fn

            def step_then_notice(state, batch):
                out = orig_step(state, batch)
                _notice()
                return out

            tr.step_fn = step_then_notice
    tr.fit()
    # both processes stop (or finish) together, so this branch is
    # consistent across the collective
    val = (
        {"psnr": float("nan"), "ssim": float("nan")}
        if tr.stopped else tr.validate()
    )
    host = jax.device_get(tr.state)
    digest = hashlib.sha256()
    for leaf in jax.tree.leaves(host.params):
        digest.update(np.ascontiguousarray(leaf).tobytes())
    step = int(np.asarray(host.step))
    ckpt_dir = tr.ckpt.directory
    tr.ckpt.close()
    if logger is not None:
        logger.close()

    # resume across processes: a fresh Trainer restores the orbax state on
    # every process (restore is collective-safe: pure read of the shared
    # directory into a replicated put)
    tr2 = Trainer(cfg.replace(ckpt_path=ckpt_dir), scene, logger=None)
    restored_step = int(np.asarray(jax.device_get(tr2.state.step)))
    tr2.ckpt.close()

    with open(a.out, "w") as f:
        json.dump(
            {
                "process": a.process_id,
                "step": step,
                "restored_step": restored_step,
                "val_psnr": float(val["psnr"]),
                "val_ssim": float(val["ssim"]),
                "params_sha": digest.hexdigest(),
                "cache_writes": int(np.asarray(host.embedding_valid).sum()),
                "is_proc0": jax.process_index() == 0,
                "stopped": bool(tr.stopped),
            },
            f,
        )


if __name__ == "__main__":
    main()
