"""The training driver: epochs over grid batches, validation renders,
checkpoints, metric logging — the TPU-native equivalent of the reference's
Lightning Trainer + NeRFSystem glue (/root/reference/
train_mask_grid_sample.py:228-453, SURVEY.md §2.5).

Key differences by design:
- ONE compiled SPMD train step (shard_map over a data mesh) instead of
  DDP processes; state is replicated, batches are sharded (SURVEY.md §2.9).
- All training state (incl. the appearance-embedding cache) in one orbax
  checkpoint; resume restores everything (the reference loses its embedding
  list — SURVEY.md §2.7).
- Validation = full-image tiled render inside jit, per-resolution compile
  cache (the reference chunk-loops on host, train…py:180-197).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from crnerf_tpu.config import Config
from crnerf_tpu.data.pipeline import TrainPipeline, full_image_batch
from crnerf_tpu.data.scene import Scene
from crnerf_tpu.parallel.mesh import (
    DATA_AXIS,
    make_mesh,
    put_global_batch,
    put_replicated,
    shard_train_step,
)
from crnerf_tpu.render.system import CrNerfSystem
from crnerf_tpu.train.metrics import psnr as psnr_fn, ssim as ssim_fn
from crnerf_tpu.train.optim import make_optimizer
from crnerf_tpu.train.state import TrainState
from crnerf_tpu.train.step import make_train_step
from crnerf_tpu.utils.checkpoint import CheckpointManager, save_weights_only
from crnerf_tpu.utils.logging import MetricLogger


class Trainer:
    def __init__(
        self,
        cfg: Config,
        scene: Scene,
        logger: Optional[MetricLogger] = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.scene = scene
        self.system = CrNerfSystem(cfg)
        self.pipeline = TrainPipeline(
            scene,
            batch_size=cfg.batch_size,
            scale_anneal=cfg.scale_anneal,
            min_scale=cfg.min_scale,
        )
        self.mesh = mesh if mesh is not None else make_mesh(cfg.num_devices)
        self.n_devices = self.mesh.devices.size
        self.grids = max(1, cfg.grids_per_step)
        self.iters_per_epoch = max(
            1, self.pipeline.iterations // (self.n_devices * self.grids)
        )
        if cfg.testit:  # smoke mode: 1 step per epoch (opt.py:40-41)
            self.iters_per_epoch = 1

        self.tx, self.lr_sched = make_optimizer(cfg, self.iters_per_epoch)

        key = jax.random.PRNGKey(cfg.seed)
        k_init, k_state = jax.random.split(key)
        variables = self.system.init(k_init)
        opt_state = self.tx.init(variables["params"])
        state = TrainState.create(
            variables,
            opt_state,
            n_vocab=cfg.N_vocab,
            embed_hw=32,
            embed_c=cfg.nerf_out_dim,
            rng=k_state,
        )
        self.state = put_replicated(state, self.mesh)

        axis = DATA_AXIS if self.n_devices > 1 else None
        step_local = make_train_step(self.system, self.tx, self.lr_sched,
                                     grad_accum_chunks=cfg.resolved_chunks(),
                                     axis_name=axis,
                                     grids_per_step=self.grids,
                                     chunk_unroll=cfg.chunk_unroll)
        if self.n_devices > 1:
            self.step_fn = shard_train_step(
                step_local, self.mesh, donate_state=cfg.donate_state
            )
        else:
            self.step_fn = jax.jit(
                step_local, donate_argnums=(0,) if cfg.donate_state else ()
            )

        if cfg.steps_per_dispatch > 1:
            # slab dispatch (Config.steps_per_dispatch): one jitted
            # lax.scan over a staged slab of batches per device round-trip.
            # Whole appearance images are NOT staged per step — the scan
            # body gathers them from the resident appearance stack (one
            # (N, Ha, Wa, 3) array instead of slab x G copies of it).
            # With slab_data='device' the RAY/TS/RGB rows follow the same
            # pattern: the scene's flat buffers live in HBM and the body
            # gathers each step's rows by the staged int32 ray_idx —
            # bitwise-identical batches (pure take of the same f32 rows),
            # ~8x less host->device traffic per slab. On the tunneled
            # TPU that staging traffic was the main product-CLI-vs-bench
            # gap (results/SLAB_TPU.md 100.5k vs BENCH_r04 165.8k).
            mode = cfg.slab_data
            buf_gb = (
                scene.all_rays.nbytes + scene.all_rgbs.nbytes
            ) / 2**30
            if mode == "auto":
                mode = (
                    "device"
                    if (buf_gb <= cfg.slab_buf_gb
                        and scene.offsets[-1] < 2**31)
                    else "host"
                )
            self._slab_device_data = mode == "device"

            def per_step(st, b, aux):
                b = dict(b)
                idx = b.pop("image_idx")
                b["whole_img"] = jnp.expand_dims(
                    jnp.take(aux["app"], idx, axis=0), -4
                )
                if "ray_idx" in b:
                    ridx = b.pop("ray_idx")
                    rows = jnp.take(aux["rays"], ridx, axis=0)
                    b["rays"] = rows[..., :8]
                    b["ts"] = rows[..., 8].astype(jnp.int32)
                    b["rgbs"] = jnp.take(aux["rgb"], ridx, axis=0)
                return step_local(st, b)

            if self.n_devices > 1:
                from crnerf_tpu.parallel.mesh import shard_train_scan

                self.scan_fn = shard_train_scan(
                    per_step, self.mesh, donate_state=cfg.donate_state
                )
            else:
                def scan_local(state, xs, aux):
                    def body(st, b):
                        return per_step(st, b, aux)

                    return jax.lax.scan(body, state, xs)

                self.scan_fn = jax.jit(
                    scan_local,
                    donate_argnums=(0,) if cfg.donate_state else (),
                )
            repl = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec()
            )
            aux = {"app": jnp.asarray(scene.appearance_stack)}
            if self._slab_device_data:
                aux["rays"] = jnp.asarray(scene.all_rays, jnp.float32)
                aux["rgb"] = jnp.asarray(scene.all_rgbs, jnp.float32)
            self._slab_aux = jax.device_put(aux, repl)

        self.logger = logger
        ckpt_dir = os.path.join(cfg.save_dir, "ckpts", cfg.exp_name)
        self.ckpt = CheckpointManager(ckpt_dir)
        self._render_cache: Dict[Tuple[int, int], callable] = {}
        self._stop_requested = False
        # step of the checkpoint this process last wrote (or restored):
        # skipping a same-step re-save is safe (identical state) and keeps
        # the stop path from entering orbax's delete-then-rewrite window,
        # where a SIGKILL mid-grace-period would destroy the newest
        # checkpoint. Re-training into an existing exp dir from a FRESH
        # state still overwrites (different process, attribute is None).
        self._last_saved_step: Optional[int] = None
        # host-side count of steps executed since the last save — plain
        # int bookkeeping so a signal handler can read it without touching
        # device state (apps/train exits immediately when 0)
        self._progress_steps = 0
        self._completed = False  # fit() ran all epochs to the end
        self._preemption_sync_broken = False  # warn-once latch
        self._dispatch_idx = 0  # slab-mode preemption sync id: +1 per
        # dispatch (see _should_stop for why raw step ids cannot be used)

        if cfg.ckpt_path:
            self.restore(cfg.ckpt_path)
        elif cfg.auto_resume and self.ckpt.latest_step() is not None:
            # preemption recovery: pick up the exp dir's latest checkpoint
            # without a manual --ckpt_path (the reference's recovery is
            # manual relaunch with resume_from_checkpoint — SURVEY.md §5.3)
            self.restore()

    @property
    def stopped(self) -> bool:
        """True once a stop was requested (sticky; see clear_stop)."""
        return self._stop_requested

    @property
    def completed(self) -> bool:
        """True once fit() ran every epoch to the natural end. With
        ``stopped`` this disambiguates a too-late signal (training done,
        skip any further deadline-unsafe work) from a mid-training
        preemption."""
        return self._completed

    @property
    def has_unsaved_progress(self) -> bool:
        """Steps executed since the last checkpoint write (host-side int —
        signal-handler safe)."""
        return self._progress_steps > 0

    # ------------------------------------------------------------- resume
    def restore(self, path_or_dir: Optional[str] = None):
        if path_or_dir is not None and path_or_dir.endswith(".npz"):
            raise ValueError(
                "resume needs a full orbax checkpoint directory; a "
                "weights.npz bundle holds inference weights only "
                "(use apps/eval for that)"
            )
        same = path_or_dir is None or (
            os.path.abspath(path_or_dir) == self.ckpt.directory
        )
        mgr = self.ckpt if same else CheckpointManager(path_or_dir)
        self.state = put_replicated(
            mgr.restore(jax.tree.map(np.asarray, self.state)), self.mesh
        )
        # the on-disk checkpoint already equals this state — a stop before
        # any new step must not re-save (see _last_saved_step)
        if same:
            self._last_saved_step = self.ckpt.latest_step()

    # ----------------------------------------------------- graceful stop
    def request_stop(self):
        """Ask fit() to checkpoint after the in-flight step and return —
        preemption recovery (apps/train wires SIGTERM/SIGINT here in
        single-process runs). Resume is EXACT: batches are a pure function
        of (epoch, step), so a restored run replays the remaining
        mid-epoch sequence (the reference loses any mid-epoch progress —
        SURVEY.md §5.3).

        Multi-process: do NOT call this from per-process signal handlers —
        a flag that flips at different step boundaries on different
        processes desynchronizes the collectives (deadlock). Preemption is
        instead agreed through jax's preemption sync point, which fit()
        polls every step (_should_stop); the cluster's SIGTERM is consumed
        by jax.distributed's sync manager."""
        self._stop_requested = True

    def clear_stop(self):
        """Re-arm a Trainer whose fit() was stopped (the flag is sticky so
        callers can distinguish a preempted fit from a completed one)."""
        self._stop_requested = False

    def _should_stop(self, sync_id: int) -> bool:
        """``sync_id`` MUST increase by exactly 1 per poll: jax's
        preemption protocol agrees on (max observed id + 1) as the safe
        stop id and returns True only when the polled id EQUALS it
        (multihost_utils.reached_preemption_sync_point). The per-step
        loop passes global_step; the slab loop passes its DISPATCH index
        — polling the raw step there (3, 6, 9, ... at slab=3) skips the
        agreed id and the stop never fires (found by the 4-process slab
        preemption test: all workers trained silently to num_epochs)."""
        if jax.process_count() > 1 and not self._preemption_sync_broken:
            try:
                from jax.experimental import multihost_utils

                # cross-process agreement: returns True at the SAME id
                # on every process once any process got the cluster's
                # preemption notice (SIGTERM to jax.distributed)
                if multihost_utils.reached_preemption_sync_point(
                    sync_id
                ):
                    self._stop_requested = True
            except RuntimeError as e:
                # no sync manager in this runtime: graceful multi-process
                # preemption is INOPERATIVE (SIGTERM will kill processes
                # outright) — warn loudly once instead of degrading
                # silently
                self._preemption_sync_broken = True
                print(
                    "WARNING: preemption sync point unavailable "
                    f"({e}); multi-process SIGTERM will NOT checkpoint "
                    "gracefully",
                    flush=True,
                )
        return self._stop_requested

    def _save_checkpoint(self, global_step: int):
        if self._last_saved_step == global_step:
            return  # identical state already on disk (see __init__)
        # EVERY process calls the orbax save: with process_count>1 orbax
        # coordinates through global barriers (a process-0-only call would
        # deadlock) and itself writes replicated values from the primary
        # host only — the reference's @rank_zero_only Lightning
        # ModelCheckpoint semantics fall out of orbax, not a guard here.
        host_state = jax.device_get(self.state)
        # force=True: re-training into an existing exp dir overwrites
        # same-step checkpoints instead of crashing
        self.ckpt.save(global_step, host_state, force=True)
        self._last_saved_step = global_step
        if jax.process_index() == 0:
            # inference bundle for the eval/video apps: plain npz host
            # I/O (tmp+rename), barrier-free, so process 0 alone writes it
            save_weights_only(
                host_state,
                os.path.join(self.ckpt.directory, "weights.npz"),
            )
        # reset only after ALL artifacts are on disk — the signal
        # handler's "nothing unsaved -> exit now" branch must not fire
        # while the npz is mid-write
        self._progress_steps = 0

    # -------------------------------------------------------------- train
    def fit(self, num_epochs: Optional[int] = None):
        cfg = self.cfg
        epochs = num_epochs if num_epochs is not None else cfg.num_epochs
        global_step = int(jax.device_get(self.state.step))
        start_epoch = global_step // self.iters_per_epoch
        for epoch in range(start_epoch, epochs):
            # plain local flag here (signals between construction and fit /
            # between epochs); the preemption SYNC POINT is only polled in
            # the step loop, once per strictly-increasing step id
            if self._stop_requested:
                self._save_checkpoint(global_step)
                return self.state
            t_ep = time.time()
            n_rays_done = 0
            if cfg.steps_per_dispatch > 1:
                global_step, n_rays_done = self._epoch_slabbed(
                    epoch, global_step
                )
            else:
                global_step, n_rays_done = self._epoch_per_step(
                    epoch, global_step
                )
            if self._stop_requested:
                self._save_checkpoint(global_step)
                return self.state
            dt = time.time() - t_ep
            if self.logger:
                self.logger.log(
                    {
                        "train/epoch": epoch,
                        "train/rays_per_sec": n_rays_done / max(dt, 1e-9),
                    },
                    global_step,
                )
            # ---- validation (reference: val at every epoch end,
            # metric-logged; train…py:340-417). val_every_epochs thins or
            # disables it (0 = off; throughput A/B runs)
            is_last = epoch == epochs - 1
            if cfg.val_every_epochs > 0 and (
                (epoch + 1) % cfg.val_every_epochs == 0 or is_last
            ):
                val = self.validate(log_images=is_last)
                if self.logger:
                    self.logger.log(
                        {"val/psnr": val["psnr"], "val/ssim": val["ssim"]},
                        global_step,
                    )
            if (epoch + 1) % cfg.ckpt_every_epochs == 0 or is_last:
                self._save_checkpoint(global_step)
        # natural completion; the stop flag stays as-is so a signal that
        # landed during the final validate/save still suppresses further
        # deadline-unsafe work in the caller (apps/train consults both)
        self._completed = True
        return self.state

    # ------------------------------------------------- epoch inner loops
    def _epoch_per_step(self, epoch: int, global_step: int):
        """One dispatch per step (prefetched host batches); returns the
        advanced (global_step, n_rays_done). Hosts the per-step-only hooks
        (Perfetto trace window, train image panels)."""
        cfg = self.cfg
        n_rays_done = 0
        for batch in self.pipeline.epoch_batches(
            epoch, self.n_devices, n_steps=self.iters_per_epoch,
            grids_per_device=self.grids,
            start_step=global_step - epoch * self.iters_per_epoch,
        ):
            if self.n_devices > 1:
                batch = put_global_batch(batch, self.mesh)
            else:
                batch = jax.tree.map(jnp.asarray, batch)
            if (
                cfg.profile
                and global_step == cfg.profile_steps[0]
                and jax.process_index() == 0
            ):
                # XLA/Perfetto trace (SURVEY.md §5.1: the reference only
                # has Lightning's 'simple' profiler)
                jax.profiler.start_trace(
                    os.path.join(cfg.save_dir, "traces", cfg.exp_name)
                )
            self.state, metrics = self.step_fn(self.state, batch)
            global_step += 1
            self._progress_steps += 1
            if (
                self.logger
                and cfg.img_panel_every > 0
                and global_step % cfg.img_panel_every == 0
                and jax.process_index() == 0
            ):
                self._log_train_panels(batch, global_step)
            if (
                cfg.profile
                and global_step == cfg.profile_steps[1]
                and jax.process_index() == 0
            ):
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
            n_rays_done += (
                cfg.batch_size * self.n_devices * self.grids
            )
            if self.logger and global_step % cfg.log_every == 0:
                m = {f"train/{k}" if "/" not in k else k: v
                     for k, v in jax.device_get(metrics).items()}
                self.logger.log(m, global_step)
            if self._should_stop(global_step):
                break
        return global_step, n_rays_done

    def _stage_slab(self, epoch: int, start: int, n: int):
        """Assemble steps [start, start+n) of the epoch as one host slab
        (leading scan axis), minus whole_img — the scan body gathers
        appearance images on device from the resident stack. In
        slab_data='device' mode only (ray_idx, uv_pix, image_idx) are
        staged; the body gathers the ray/ts/rgb rows from the resident
        buffers (bitwise-identical stream, tests/test_slab_gather.py)."""
        total = self.n_devices * self.grids
        dev_data = self._slab_device_data
        mk_one = (
            self.pipeline.make_batch_idx if dev_data
            else self.pipeline.make_batch
        )
        mk_global = (
            self.pipeline.make_global_batch_idx if dev_data
            else self.pipeline.make_global_batch
        )
        host = []
        for i in range(start, start + n):
            if total > 1:
                b = mk_global(epoch, i, total)
                if self.n_devices > 1 and self.grids > 1:
                    b = {
                        k: v.reshape(
                            self.n_devices, self.grids, *v.shape[1:]
                        )
                        for k, v in b.items()
                    }
            else:
                b = mk_one(epoch, i)
            b.pop("whole_img", None)
            host.append(b)
        xs = {k: np.stack([h[k] for h in host]) for k in host[0]}
        if self.n_devices > 1:
            from crnerf_tpu.parallel.mesh import put_global_slab

            return put_global_slab(xs, self.mesh)
        return jax.tree.map(jnp.asarray, xs)

    def _epoch_slabbed(self, epoch: int, global_step: int):
        """Slab dispatch (Config.steps_per_dispatch): identical batch
        stream and step math as _epoch_per_step, but the device executes
        steps_per_dispatch steps per host round-trip inside one jitted
        lax.scan — the pattern bench.py/scripts/quality_run.py proved out
        against the high-latency tunnel, promoted into the product. At
        most two program shapes compile per run (full slab + remainder).
        Preemption is polled at slab boundaries with a per-DISPATCH sync
        id (see _should_stop: jax's sync protocol needs ids that
        advance by 1 per poll — raw step ids would skip the agreed
        stop), so a stop loses at most one slab of work to the resume
        replay (still exact: batches are a pure f(epoch, step))."""
        cfg = self.cfg
        slab = cfg.steps_per_dispatch
        step_in_ep = global_step - epoch * self.iters_per_epoch
        n_rays_done = 0
        inflight: list = []  # (first_step_id, n_steps, metrics handles)

        def _drain_oldest():
            """Wait for + log the OLDEST in-flight slab. Logging happens
            here — on the slab the backpressure pop is already waiting
            for — instead of device_get-ing the slab just dispatched,
            which collapsed the two-slab pipeline on every logged slab
            (advisor r4). Step ids ride along in the inflight tuple."""
            first, n, metrics = inflight.pop(0)
            hits = (
                [i for i in range(n) if (first + i) % cfg.log_every == 0]
                if self.logger and cfg.log_every > 0
                else []
            )
            if hits:
                mh = jax.device_get(metrics)
                for i in hits:
                    m = {
                        f"train/{k}" if "/" not in k else k: v[i]
                        for k, v in mh.items()
                    }
                    self.logger.log(m, first + i)
            else:
                jax.device_get(jax.tree.leaves(metrics)[0])

        while step_in_ep < self.iters_per_epoch:
            n = min(slab, self.iters_per_epoch - step_in_ep)
            xs = self._stage_slab(epoch, step_in_ep, n)
            # Backpressure: dispatch is async (over the axon tunnel even
            # block_until_ready returns early), so without a bound here
            # the host races ahead and every staged slab's input buffers
            # pile up live on device — a whole staged epoch (~0.8 GB on
            # top of the step working set) crashed the TPU worker when
            # first tried. Waiting on the metrics of the slab TWO back
            # keeps at most two slabs in flight (+ this staged one)
            # while still overlapping host batch-assembly with device
            # compute and hiding one dispatch round-trip.
            if len(inflight) >= 2:
                _drain_oldest()
            self.state, metrics = self.scan_fn(
                self.state, xs, self._slab_aux
            )
            inflight.append((global_step + 1, n, metrics))
            global_step += n
            step_in_ep += n
            self._progress_steps += n
            self._dispatch_idx += 1
            n_rays_done += (
                n * cfg.batch_size * self.n_devices * self.grids
            )
            if self._should_stop(self._dispatch_idx):
                break
        # Drain the in-flight tail: emits its logs and makes the caller's
        # epoch wall-clock include ALL the epoch's device work (the old
        # loop returned with up to two slabs still executing, flattering
        # train/rays_per_sec by up to 2/n_slabs).
        while inflight:
            _drain_oldest()
        return global_step, n_rays_done

    # ------------------------------------------------------- train panels
    def _log_train_panels(self, batch, global_step: int):
        """gt / pred / random-style pred / mask panels from the CURRENT
        training grid, every ``img_panel_every`` steps (reference logs the
        same panels to wandb every 5000 steps —
        train_mask_grid_sample.py:299-335). Renders device-0/grid-0 of the
        batch through a separately-jitted no-grad forward (the hot train
        step stays untouched)."""
        cfg = self.cfg
        # slice the leading device/grid axes down to one flat (B, ...) grid
        b = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), batch)
        lead = (self.n_devices > 1) + (self.grids > 1)
        for _ in range(lead):
            b = jax.tree.map(lambda x: x[0], b)

        if not hasattr(self, "_panel_fn"):
            from crnerf_tpu.train.step import _select_random_embedding

            def panels(state: TrainState, pb):
                variables = {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                }
                _, ksel, kf = jax.random.split(state.rng, 3)
                a_rand, has_any = _select_random_embedding(ksel, state)
                use_rand = cfg.encode_random and cfg.encode_a
                results, _ = self.system.forward(
                    variables, pb, kf,
                    a_embedded_random=a_rand if use_rand else None,
                    random_has_any=has_any if use_rand else None,
                    train=True,
                )
                hw = cfg.grid_hw
                typ = "rgb_fine" if cfg.N_importance > 0 else "rgb_coarse"
                out = {"pred": results[typ].reshape(hw, hw, 3)}
                if "rgb_fine_random" in results:
                    out["pred_random"] = results["rgb_fine_random"].reshape(
                        hw, hw, 3
                    )
                if "out_mask" in results:
                    out["mask"] = results["out_mask"].reshape(hw, hw)
                if "rgb_content_img" in results:
                    out["content"] = results["rgb_content_img"].reshape(
                        hw, hw, 3
                    )
                return out

            self._panel_fn = jax.jit(panels)

        out = jax.device_get(self._panel_fn(self.state, b))
        hw = cfg.grid_hw
        self.logger.log_image(
            "train/gt", b["rgbs"].reshape(hw, hw, 3), global_step
        )
        self.logger.log_image("train/pred", out["pred"], global_step)
        if "pred_random" in out:
            self.logger.log_image(
                "train/pred_random", out["pred_random"], global_step
            )
        if "mask" in out:
            self.logger.log_image(
                "train/mask", np.repeat(out["mask"][..., None], 3, -1),
                global_step,
            )
        if "content" in out:
            self.logger.log_image("train/content", out["content"],
                                  global_step)

    # ---------------------------------------------------------- rendering
    def _render_fn(self, hw: Tuple[int, int]):
        """Per-resolution compiled full-image renderer (SURVEY.md §7 hard
        part 1: per-shape compile cache). With >1 device the rays are
        sharded over the mesh and features all-gathered before the decode
        (parallel.mesh.shard_render)."""
        if hw in self._render_cache:
            return self._render_cache[hw]
        tile = min(self.cfg.val_chunk, hw[0] * hw[1])

        if self.n_devices > 1:
            from crnerf_tpu.parallel.mesh import shard_render

            sfn = shard_render(self.system, self.mesh, hw, tile=tile)

            def render(state: TrainState, rays, whole_img, key):
                variables = {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                }
                return sfn(variables, rays, whole_img, key)
        else:
            def render_local(state: TrainState, rays, whole_img, key):
                variables = {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                }
                batch = {"rays": rays, "whole_img": whole_img}
                results, _ = self.system.forward(
                    variables, batch, key, train=False, tile=tile,
                    image_hw=hw,
                )
                return results

            render = jax.jit(render_local)
        self._render_cache[hw] = render
        return render

    def render_image(self, image, appearance_img=None, state=None):
        """Full render of one SceneImage -> dict with rgb (h,w,3), depth,
        mask. Uses the image's own appearance unless overridden
        (eval.py:275-278 / video demo)."""
        state = state if state is not None else self.state
        b = full_image_batch(self.scene, image, appearance_img)
        w, h = image.wh
        fn = self._render_fn((h, w))
        out = fn(
            state,
            jnp.asarray(b["rays"]),
            jnp.asarray(b["whole_img"]),
            jax.random.PRNGKey(0),
        )
        typ = "rgb_fine" if "rgb_fine" in out else "rgb_coarse"
        res = {
            "rgb": np.asarray(
                jax.device_get(out[typ])
            ).reshape(h, w, 3),
            "depth": np.asarray(
                jax.device_get(
                    out.get("depth_fine", out["depth_coarse"])
                )
            ).reshape(h, w),
        }
        if "out_mask" in out:
            res["mask"] = np.asarray(
                jax.device_get(out["out_mask"])
            ).reshape(h, w)
        return res

    # ---------------------------------------------------------- validate
    def validate(self, max_images: int = 1,
                 log_images: bool = False) -> Dict[str, float]:
        """Render the first train image(s) full-res and score PSNR/SSIM —
        the reference's val protocol (val image = first train image,
        phototourism…py:215-216; metrics train…py:396-417). With
        ``log_images`` the gt/pred/depth/mask panels go to the logger
        (reference val image panels, train…py:373-395)."""
        psnrs, ssims = [], []
        for im in self.scene.train_images[:max_images]:
            out = self.render_image(im)
            w, h = im.wh
            gt = im.rgbs.reshape(h, w, 3)
            psnrs.append(float(psnr_fn(jnp.asarray(out["rgb"]),
                                       jnp.asarray(gt))))
            ssims.append(float(ssim_fn(jnp.asarray(out["rgb"]),
                                       jnp.asarray(gt))))
            if log_images and self.logger:
                from crnerf_tpu.utils.visualization import visualize_depth

                step = int(jax.device_get(self.state.step))
                self.logger.log_image("val/gt", gt, step)
                self.logger.log_image("val/pred", out["rgb"], step)
                self.logger.log_image(
                    "val/depth", visualize_depth(out["depth"]), step
                )
                if "mask" in out:
                    self.logger.log_image(
                        "val/mask",
                        np.repeat(out["mask"][..., None], 3, -1), step,
                    )
        return {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims))}
