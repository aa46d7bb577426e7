"""Production dress rehearsal: the full reference workflow at realistic
scale, end to end, with per-stage wall clocks recorded.

A reference user's L7->L6 sequence is train.sh -> test.sh ->
get_video_demo.sh (/root/reference/command/train.sh:24, test.sh:17-32,
get_video_demo.sh:16-21). This script runs the same sequence against a
GENERATED phototourism-like scene at Brandenburg-like scale:

  1. generate  — >=100 train images with heterogeneous ORIGINAL sizes
                 spanning >=2 octaves (log-uniform widths, mixed aspect
                 ratios, per-image appearance tints, transient occluders
                 on ~30% of train images), written as a real COLMAP scene
                 (cameras.bin/images.bin/points3D.bin + <scene>.tsv +
                 dense/images/*.jpg) so every loader quirk the reference
                 has (qvec inversion, pose flip, near/far percentiles,
                 scale-to-5, tsv filename matching) is exercised.
  2. prepare   — apps/prepare: decode + cache at img_downscale=2 (the
                 paper-repro protocol, reference command/train.sh:23).
  3. train     — 20 epochs of the FLAGSHIP config (8x256 coarse+fine,
                 64+64 samples, batch 1024, G=16 grids/step, N_vocab
                 1500, bf16, fused Pallas kernels + stash backward) via
                 the staged per-epoch lax.scan pattern (per-step dispatch
                 pays ~1-2 s tunnel latency — scripts/quality_run.py).
                 Device math is identical to apps/train; only the feeding
                 changes. Writes the standard orbax ckpt + weights.npz.
  4. eval      — apps/eval --split test_test: bucketed full-image render
                 of ALL test images; compile counts and s/frame recorded
                 (<= 4 compiles per 2x pixel band claim).
  5. metrics   — apps/eval_metric: right-half PSNR/SSIM/MSE protocol.
  6. video     — apps/video: camera-path appearance-hallucination demo.

Writes results/REHEARSAL.md with per-stage wall clock, compile counts,
peak HBM, throughput, and the metric scores.

Usage:
  python scripts/rehearsal.py --root /tmp/rehearsal_scene \
      --save_dir /tmp/rehearsal_out [--epochs 20] [--n_train 100]
  # resume after interruption: stages skip when their artifact exists
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENE_NAME = "rehearsal_brandenburg_gate"  # suffix picks the camera-path
# preset (render/camera_path.py resolve_scene, reference
# appearance_modification_video.py:214-219)

# Quality gate (--gate): fail the run when psnr_right_half lands below
# mean - 2*sigma of the recorded multi-seed band at the standard
# 20-epoch rehearsal config (the de-facto reference regression check is
# exactly this protocol — /root/reference/command/test.sh:17-32 ->
# eval_metric.py). Band measured 2026-08-20 on the real chip, seeds
# {42, 0, 1}: 21.226 / 19.721 / 22.177 dB -> mean 21.041, sample sigma
# 1.238 (20-epoch runs are mid-convergence, so seed spread is wide —
# the 60-epoch small-scale gate sees ~0.88 dB). Rows:
# results/REHEARSAL_BAND.md; small-scale sibling:
# scripts/quality_run.py --gate.
REHEARSAL_GATE_MEAN: float | None = 21.041
REHEARSAL_GATE_FLOOR: float | None = 18.565

ASPECTS = ((4, 3), (3, 2), (16, 9), (2, 3))  # landscape + one portrait


def generate_scene(root: str, n_train: int, n_test: int, seed: int = 0,
                   scale: float = 1.0):
    """Brandenburg-like COLMAP scene around the synthetic sphere world.

    Original widths: train log-uniform in [320, 1600] px (>=2 octaves at
    ds2: 160..800); test in [600, 1200] so the ds2 PIXEL counts stay
    within a ~2-octave band (the bucketing-claim regime). ``scale``
    shrinks every size (CPU smoke)."""
    from PIL import Image as PILImage

    from crnerf_tpu.data import colmap
    from crnerf_tpu.data.synthetic import _look_at, _shade
    from crnerf_tpu.core.rays import get_ray_directions
    from crnerf_tpu.core.rays import get_rays

    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "dense/sparse"), exist_ok=True)
    os.makedirs(os.path.join(root, "dense/images"), exist_ok=True)

    sphere_c = np.zeros(3)
    sphere_r = 1.0
    light = np.array([0.4, 0.8, 0.45])
    light /= np.linalg.norm(light)

    n_total = n_train + n_test
    cams, ims = {}, {}
    names, splits = [], []
    for i in range(n_total):
        is_test = i >= n_train
        if is_test:
            w0 = int(scale * np.exp(rng.uniform(np.log(600),
                                                np.log(1200))))
        else:
            w0 = int(scale * np.exp(rng.uniform(np.log(320),
                                                np.log(1600))))
        w0 = max(w0, 32)
        aw, ah = ASPECTS[rng.randint(len(ASPECTS))]
        h0 = int(w0 * ah / aw)
        w0, h0 = (w0 // 4) * 4, (h0 // 4) * 4  # even after ds2

        theta = 2 * np.pi * i / n_total + rng.uniform(-0.1, 0.1)
        radius = 3.0 + rng.uniform(-0.3, 0.3)
        eye = np.array([
            radius * np.sin(theta),
            0.8 + 0.3 * np.sin(3 * theta) + rng.uniform(-0.1, 0.1),
            radius * np.cos(theta),
        ])
        c2w = _look_at(eye, sphere_c)  # right-up-back, as get_rays wants

        focal = 0.9 * w0 * rng.uniform(0.9, 1.1)
        K = np.array(
            [[focal, 0, w0 / 2], [0, focal, h0 / 2], [0, 0, 1]],
            np.float32,
        )
        dirs = get_ray_directions(h0, w0, K)
        rays_o, rays_d = get_rays(dirs, c2w)
        tint = 1.0 + 0.25 * rng.uniform(-1, 1, 3)
        rgbs = _shade(rays_o, rays_d, tint, sphere_c, sphere_r, light)
        img = rgbs.reshape(h0, w0, 3)
        if not is_test and rng.rand() < 0.3:
            # transient occluder (phototourism pedestrians/cars): never
            # multi-view consistent; the CGNet mask must learn it away
            bh, bw = h0 // 5, w0 // 5
            y0, x0 = rng.randint(0, h0 - bh), rng.randint(0, w0 - bw)
            img = img.copy()
            img[y0:y0 + bh, x0:x0 + bw] = rng.uniform(0, 1, 3)

        name = f"img_{i:04d}.jpg"
        PILImage.fromarray(
            (np.clip(img, 0, 1) * 255).astype(np.uint8)
        ).save(os.path.join(root, "dense/images", name), quality=92)

        # COLMAP stores w2c in right-down-front; the loader flips columns
        # y/z after inverting (data/phototourism.py:147-149) — invert that
        c2w_rdf = c2w.copy()
        c2w_rdf[:, 1:3] *= -1
        m = np.eye(4)
        m[:3] = c2w_rdf
        w2c = np.linalg.inv(m)
        q = colmap.rotmat2qvec(w2c[:3, :3])
        t = w2c[:3, 3]
        cam_id = i + 1
        cams[cam_id] = colmap.Camera(
            cam_id, "PINHOLE", w0, h0,
            np.array([focal, focal, w0 / 2, h0 / 2]),
        )
        ims[cam_id] = colmap.Image(
            cam_id, q, t, cam_id, name,
            np.zeros((0, 2)), np.zeros(0, np.int64),
        )
        names.append(name)
        splits.append("test" if is_test else "train")

    # 3D points: sphere surface (near structure) + a far shell so the
    # 0.1/99.9 near/far percentiles bracket the visible world
    pts = {}
    n_pts = 3000
    u = rng.normal(size=(n_pts, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    radii = np.concatenate([
        np.full(n_pts - 500, sphere_r),
        np.full(500, 2.5),
    ])
    xyz = u * radii[:, None]
    for pid in range(n_pts):
        pts[pid] = colmap.Point3D(
            pid, xyz[pid], np.array([128, 128, 128]), 0.5,
            np.array([1], np.int64), np.array([0], np.int64),
        )

    colmap.write_cameras_binary(
        cams, os.path.join(root, "dense/sparse/cameras.bin"))
    colmap.write_images_binary(
        ims, os.path.join(root, "dense/sparse/images.bin"))
    colmap.write_points3d_binary(
        pts, os.path.join(root, "dense/sparse/points3D.bin"))
    with open(os.path.join(root, f"{SCENE_NAME}.tsv"), "w") as f:
        f.write("filename\tid\tsplit\tdataset\n")
        for i, (n, s) in enumerate(zip(names, splits)):
            f.write(f"{n}\t{i}\t{s}\t{SCENE_NAME}\n")


def _hbm_peak():
    """Peak HBM GiB, or a note when the backend can't report it (the
    axon tunnel returns zeros — BASELINE.md Trevi-envelope row; the fit
    proof there is the completed full-speed run + analytic sizes)."""
    import jax

    try:
        ms = jax.devices()[0].memory_stats() or {}
        peak = ms.get("peak_bytes_in_use", 0) / 2**30
    except Exception:
        peak = 0.0
    if peak <= 0.0:
        return "unavailable (memory_stats zero over tunnel; fit = run completed)"
    return round(peak, 2)


def stage_train(args, report):
    """20 flagship epochs via the staged per-epoch scan."""
    import jax
    import jax.numpy as jnp

    from crnerf_tpu.config import Config
    from crnerf_tpu.data.phototourism import load_phototourism
    from crnerf_tpu.data.pipeline import TrainPipeline  # noqa: F401 (doc)
    from crnerf_tpu.train.loop import Trainer
    from crnerf_tpu.train.step import make_train_step

    on_tpu = jax.devices()[0].platform != "cpu"
    G = args.grids
    cfg = Config(
        root_dir=args.root,
        dataset_name="phototourism",
        scene_name=SCENE_NAME,
        img_downscale=2,
        N_vocab=args.n_vocab,
        grids_per_step=G,
        compute_dtype="bfloat16" if on_tpu else "float32",
        pallas_train=on_tpu,
        use_pallas=on_tpu,
        num_epochs=args.epochs,
        appearance_wh=(224, 160),
        exp_name="rehearsal",
        save_dir=args.save_dir,
        seed=args.seed,
    )
    if not on_tpu:  # CPU smoke: shrink the model, keep the plumbing
        cfg = cfg.replace(
            batch_size=64, N_samples=8, N_importance=8, netdepth=2,
            netwidth=32, nerf_out_dim=16, chunk=1024,
            appearance_wh=(64, 48),
        )
    t0 = time.perf_counter()
    scene = load_phototourism(
        args.root, img_downscale=2,
        appearance_wh=tuple(cfg.appearance_wh),
        use_cache=not args.cpu,  # the cache pins (224,160) appearances
    )
    scene.build_ray_buffers()
    report["scene_load_s"] = round(time.perf_counter() - t0, 1)
    report["n_train"] = len(scene.train_images)
    report["n_test"] = len(scene.test_images)
    ds2_wh = [im.wh for im in scene.train_images]
    px = sorted(w * h for w, h in ds2_wh)
    report["train_px_octaves"] = round(
        float(np.log2(px[-1] / px[0])), 2
    )

    trainer = Trainer(cfg, scene)
    pipe = trainer.pipeline
    steps = trainer.iters_per_epoch
    if args.max_steps_per_epoch:
        steps = min(steps, args.max_steps_per_epoch)
    report["steps_per_epoch"] = steps
    report["total_steps"] = steps * args.epochs
    print(f"[train] {steps} steps/epoch x {args.epochs} epochs, G={G}, "
          f"batch {cfg.batch_size} -> "
          f"{steps * args.epochs * cfg.batch_size * G / 1e6:.1f}M rays",
          flush=True)

    step_local = make_train_step(
        trainer.system, trainer.tx, trainer.lr_sched, grids_per_step=G,
        grad_accum_chunks=cfg.resolved_chunks(),
        chunk_unroll=cfg.chunk_unroll,
    )
    app_stack = jnp.asarray(scene.appearance_stack)

    def body(state, x):
        idx = x.pop("image_idx")
        x["whole_img"] = app_stack[idx][:, None]  # (G, 1, Ha, Wa, 3)
        state, m = step_local(state, x)
        return state, {"loss": m["loss"], "psnr": m["psnr"]}

    @jax.jit
    def run_slab(state, xs):
        return jax.lax.scan(body, state, xs)

    # Stage the epoch in fixed-size SLABS, not whole: a full 874-step
    # epoch is ~0.8 GB of staged batches ON TOP of the step working set
    # (stash + 393 MB cache), which crashed the TPU worker when first
    # run whole-epoch. One compiled slab shape, n_slabs dispatches
    # (~1-2 s tunnel latency each) per epoch. The epoch is rounded UP
    # to n_slabs*slab steps (the sampler is pure f(epoch, step) so the
    # few extra steps are well-defined; lr schedule shifts <0.2%/epoch).
    slab = min(int(os.environ.get("CRNERF_REHEARSAL_SLAB", "125")), steps)
    n_slabs = -(-steps // slab)
    eff_steps = n_slabs * slab
    report["slab_steps"] = slab
    report["eff_steps_per_epoch"] = eff_steps

    state = trainer.state
    epoch_s, stage_s, gen_s = [], [], []
    t_train0 = time.perf_counter()
    for ep in range(args.epochs):
        # Pipelined slabs, same pattern as Trainer._epoch_slabbed:
        # dispatch is async, so host batch-assembly of slab s+1 overlaps
        # device execution of slab s; waiting on the curve of the slab
        # two back bounds the staged input buffers live on device to ~3
        # slabs (a whole staged epoch, ~0.8 GB on top of the working
        # set, crashed the TPU worker when first tried). Epochs are
        # timed WALL-clock — the end-to-end production number — with
        # gen/stage serial components recorded alongside.
        t_ep = time.perf_counter()
        e_stage = e_gen = 0.0
        inflight = []
        curve = None  # stays None if n_slabs == 0 (tiny smoke configs)
        for s in range(n_slabs):
            tg = time.perf_counter()
            host = []
            for i in range(s * slab, (s + 1) * slab):
                b = pipe.make_global_batch(ep, i, G)
                b.pop("whole_img")
                host.append(b)
            xs_host = {k: np.stack([b[k] for b in host])
                       for k in host[0]}
            e_gen += time.perf_counter() - tg
            ts = time.perf_counter()
            xs = jax.device_put(
                {k: jnp.asarray(v) for k, v in xs_host.items()}
            )
            e_stage += time.perf_counter() - ts
            if len(inflight) >= 2:
                jax.device_get(inflight.pop(0)["psnr"][-1:])
            state, curve = run_slab(state, xs)
            inflight.append(curve)
            del xs
        # drains the epoch's dispatches (nan when n_slabs == 0)
        last = (
            float(curve["psnr"][-1]) if curve is not None else float("nan")
        )
        e_wall = time.perf_counter() - t_ep
        epoch_s.append(e_wall)
        gen_s.append(e_gen)
        stage_s.append(e_stage)
        print(f"[train] epoch {ep + 1}/{args.epochs}: wall "
              f"{e_wall:.1f}s over {n_slabs} slabs (gen {e_gen:.1f}s, "
              f"stage {e_stage:.1f}s, overlapped), train psnr {last:.2f}",
              flush=True)
        if ep == 0:
            report["hbm_peak_gib_epoch1"] = _hbm_peak()

    report["train_wall_s"] = round(time.perf_counter() - t_train0, 1)
    if epoch_s:  # epochs=0 smoke configs have no per-epoch rows
        # wall-clock keys (these were misnamed *_device_s_* before —
        # epochs are timed end-to-end on the host, advisor r4)
        report["epoch_wall_s_median"] = round(
            sorted(epoch_s)[len(epoch_s) // 2], 1
        )
        report["epoch0_wall_s_incl_compile"] = round(epoch_s[0], 1)
        report["batch_gen_s_total"] = round(sum(gen_s), 1)
        report["stage_in_s_total"] = round(sum(stage_s), 1)
        steady = epoch_s[1:] or epoch_s
        rays_per_epoch = eff_steps * cfg.batch_size * G
        report["train_rays_per_sec_steady"] = round(
            rays_per_epoch / (sorted(steady)[len(steady) // 2]), 0
        )
    report["hbm_peak_gib"] = _hbm_peak()

    trainer.state = state
    trainer._save_checkpoint(args.epochs * eff_steps)
    trainer.ckpt.close()
    report["ckpt_dir"] = trainer.ckpt.directory
    return trainer.ckpt.directory


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/rehearsal_scene")
    ap.add_argument("--save_dir", default="/tmp/rehearsal_out")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--n_train", type=int, default=100)
    ap.add_argument("--n_test", type=int, default=15)
    ap.add_argument("--n_vocab", type=int, default=1500)
    ap.add_argument("--grids", type=int, default=16)
    ap.add_argument("--n_frames", type=int, default=60,
                    help="video-demo frames (reference preset is 240)")
    ap.add_argument("--seed", type=int, default=42,
                    help="training seed (Config.seed; the quality band "
                         "varies this — results/REHEARSAL_BAND.md)")
    ap.add_argument("--skip_video", action="store_true",
                    help="stop after metrics (seed-band quality runs "
                         "don't need the video stage)")
    ap.add_argument("--gate", action="store_true",
                    help="fail (exit 1) if psnr_right_half < the "
                         "recorded band's mean - 2*sigma")
    ap.add_argument("--out_md", default=None,
                    help="report path (default results/REHEARSAL.md)")
    ap.add_argument("--cpu", action="store_true",
                    help="tiny-model CPU smoke of the whole sequence")
    ap.add_argument("--max_steps_per_epoch", type=int, default=0,
                    help="cap steps/epoch (0 = the full epoch; smokes)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from crnerf_tpu.utils.jit_cache import enable as _ejc
    _ejc()

    report = {"argv": vars(args)}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_md = args.out_md or os.path.join(repo, "results", "REHEARSAL.md")

    # ---- 1. generate ------------------------------------------------
    marker = os.path.join(args.root, f"{SCENE_NAME}.tsv")
    t0 = time.perf_counter()
    if not os.path.exists(marker):
        print(f"[generate] {args.n_train}+{args.n_test} images -> "
              f"{args.root}", flush=True)
        generate_scene(args.root, args.n_train, args.n_test,
                       scale=0.1 if args.cpu else 1.0)
        report["generate_s"] = round(time.perf_counter() - t0, 1)
    else:
        print("[generate] scene exists, skipping", flush=True)
        report["generate_s"] = "skipped (exists)"

    # ---- 2. prepare (cache build) -----------------------------------
    from crnerf_tpu.apps.prepare import main as prepare_main

    t0 = time.perf_counter()
    cache = os.path.join(args.root, "cache_tpu", "scene_ds2.npz")
    if not os.path.exists(cache):
        prepare_main(["--root_dir", args.root, "--img_downscale", "2",
                      "--appearance_wh", "224", "160"])
        report["prepare_s"] = round(time.perf_counter() - t0, 1)
    else:
        report["prepare_s"] = "skipped (cache exists)"

    # ---- 3. train ----------------------------------------------------
    ckpt_dir = os.path.join(args.save_dir, "ckpts", "rehearsal")
    if not os.path.exists(os.path.join(ckpt_dir, "weights.npz")):
        ckpt_dir = stage_train(args, report)
    else:
        print("[train] weights.npz exists, skipping", flush=True)
        report["train_wall_s"] = "skipped (ckpt exists)"

    # ---- 4. eval: bucketed render of ALL test images -----------------
    from crnerf_tpu.apps.eval import main as eval_main

    common = ["--root_dir", args.root, "--dataset_name", "phototourism",
              "--scene_name", SCENE_NAME, "--img_downscale", "2",
              "--N_vocab", str(args.n_vocab),
              "--save_dir", args.save_dir]
    if args.cpu:  # match the tiny CPU-smoke checkpoint architecture
        arch = ["--netdepth", "2", "--netwidth", "32",
                "--nerf_out_dim", "16", "--N_samples", "8",
                "--N_importance", "8", "--chunk", "1024",
                "--appearance_wh", "64", "48"]
    else:  # the test.sh protocol (reference command/test.sh:22-25)
        arch = ["--N_samples", "256", "--N_importance", "256",
                "--chunk", "16384", "--compute_dtype", "bfloat16"]
    t0 = time.perf_counter()
    buf = io.StringIO()
    with redirect_stdout(buf):
        eval_main(common + arch + [
            "--split", "test_test", "--ckpt_path", ckpt_dir,
        ])
    eval_log = buf.getvalue().strip()
    print(eval_log, flush=True)
    report["eval_wall_s"] = round(time.perf_counter() - t0, 1)
    report["eval_log"] = eval_log.splitlines()[-1] if eval_log else ""

    # ---- 5. metrics: right-half protocol ------------------------------
    from crnerf_tpu.apps.eval_metric import main as metric_main

    t0 = time.perf_counter()
    m = metric_main(["--root_dir", args.root,
                     "--dataset_name", "phototourism",
                     "--scene_name", SCENE_NAME,
                     "--img_downscale", "2",
                     "--save_dir", args.save_dir])
    report["metrics_s"] = round(time.perf_counter() - t0, 1)
    report["psnr_right_half"] = round(float(m["psnr"]), 3)
    report["ssim_right_half"] = round(float(m["ssim"]), 4)
    if "mse" in m:
        report["mse_right_half"] = float(m["mse"])

    # ---- quality gate (directive r4-4) --------------------------------
    if args.gate:
        got = report["psnr_right_half"]
        if REHEARSAL_GATE_FLOOR is None:
            print("[gate] no band recorded yet (REHEARSAL_GATE_FLOOR "
                  "unset) — cannot gate", flush=True)
            sys.exit(2)
        verdict = "PASS" if got >= REHEARSAL_GATE_FLOOR else "FAIL"
        print(f"[gate] psnr_right_half {got:.3f} vs floor "
              f"{REHEARSAL_GATE_FLOOR:.3f} (band mean "
              f"{REHEARSAL_GATE_MEAN:.3f}): {verdict}", flush=True)
        report["gate"] = verdict
        if verdict == "FAIL":
            _write_report(report, out_md, args)
            sys.exit(1)

    # ---- 6. video demo -------------------------------------------------
    if args.skip_video:
        report["video_s"] = "skipped (--skip_video)"
        _write_report(report, out_md, args)
        print(f"[report] -> {out_md}", flush=True)
        return

    from crnerf_tpu.apps.video import main as video_main

    style_dir = os.path.join(args.save_dir, "styles")
    os.makedirs(style_dir, exist_ok=True)
    style_path = os.path.join(style_dir, "style_0.png")
    if not os.path.exists(style_path):
        from PIL import Image as PILImage

        src = sorted(os.listdir(os.path.join(args.root, "dense/images")))[0]
        im = PILImage.open(
            os.path.join(args.root, "dense/images", src)
        ).convert("RGB")
        arr = np.asarray(im, np.float32)
        arr = np.clip(arr * np.array([1.3, 0.9, 0.7]), 0, 255)
        PILImage.fromarray(arr.astype(np.uint8)).save(style_path)
    t0 = time.perf_counter()
    vid_arch = (
        ["--netdepth", "2", "--netwidth", "32", "--nerf_out_dim", "16",
         "--N_samples", "8", "--N_importance", "8", "--chunk", "1024",
         "--appearance_wh", "64", "48", "--img_wh", "64", "48"]
        if args.cpu else
        ["--img_wh", "320", "240"]
    )
    video_main(["--ckpt_path", ckpt_dir, "--scene_name", SCENE_NAME,
                "--style_dir", style_dir, "--save_dir", args.save_dir,
                "--n_frames", str(args.n_frames)] + vid_arch)
    report["video_s"] = round(time.perf_counter() - t0, 1)
    report["video_frames"] = args.n_frames

    # ---- report --------------------------------------------------------
    _write_report(report, out_md, args)
    print(f"[report] -> {out_md}", flush=True)


def _write_report(report, out_md, args):
    os.makedirs(os.path.dirname(out_md), exist_ok=True)
    lines = [
        "# Production dress rehearsal",
        "",
        "The reference user's train.sh -> test.sh -> get_video_demo.sh",
        "sequence on a generated Brandenburg-like scene "
        f"({report.get('n_train', args.n_train)} train / "
        f"{report.get('n_test', args.n_test)} test images, heterogeneous",
        "sizes, COLMAP on-disk format, N_vocab "
        f"{args.n_vocab}, img_downscale 2). Produced by",
        "`python scripts/rehearsal.py`; stages skip when their artifact",
        "already exists (restartable).",
        "",
        "| Stage | Result |",
        "|---|---|",
    ]
    for k, v in report.items():
        if k == "argv":
            continue
        lines.append(f"| {k} | {v} |")
    lines += ["", "```json", json.dumps(report, indent=2, default=str),
              "```", ""]
    with open(out_md, "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
