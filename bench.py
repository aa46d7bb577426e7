"""Headline benchmark: train-step throughput (rays/sec/chip) on the full
CR-NeRF config (8x256 coarse+fine MLPs, 64+64 samples/ray, style head,
CGNet mask, batch 1024 — /root/reference/command/train.sh:24) with
grids_per_step=16 (the reference's --num_gpus 16 DDP semantics on one chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"value" is the MEDIAN of --reps (default 3) independent marginal
measurements taken back-to-back under one compile; "spread" is
(max-min)/median across the reps and "hour" is the UTC capture stamp —
the tunnel's throughput drifts ±1.3% across hours (BASELINE.md), so
round-over-round comparisons need both. The same capture also times the
production eval path (bucketed 320x240 full-image render at the test
protocol's 256+256 sampling) and reports it as "eval_s_per_frame";
CRNERF_BENCH_NO_EVAL=1 skips that leg.

Timing methodology (IMPORTANT on this TPU tunnel): ``block_until_ready``
does not actually wait for remote execution here, and per-call host->device
batch transfer rides an HTTP tunnel. So the benchmark (a) pre-stages all
batches on device, (b) runs K steps inside ONE jitted lax.scan, (c) forces
a scalar FETCH of a value depending on the final state, and (d) reports the
MARGINAL time between a 2K-step and a K-step scan, canceling the fixed
dispatch/fetch overhead. Cross-checked against raw matmul chains (172.5
measured vs 197 peak bf16 TFLOP/s on v5e).

vs_baseline normalizes against BASELINE_RAYS_PER_SEC, an estimate of the
PyTorch reference's CUDA train throughput (nothing published — SURVEY.md
§6). BASELINE.md tracks the assumption.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 20_000.0  # estimated PyTorch-CUDA reference
K_STEPS = 10
N_STAGED = 4


def _wait_for_backend(tries: int | None = None, wait_s: int = 120,
                      probe_timeout: int = 300):
    """The axon TPU tunnel intermittently reports UNAVAILABLE at backend
    init (outages of hours have been observed), and jax caches an init
    failure for the life of the process — so probe in a SUBPROCESS until
    the backend comes up, then init here. CRNERF_BENCH_TRIES overrides
    the probe budget (default 10 ≈ up to ~70 min of patience)."""
    import os
    import subprocess
    import sys

    if tries is None:
        tries = int(os.environ.get("CRNERF_BENCH_TRIES", "10"))

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return  # a host backend can't be down (note: the env var alone
        # doesn't steer THIS process — callers on CPU also set
        # jax.config; the probe is only for the flaky TPU tunnel)

    for i in range(tries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=probe_timeout,
            )
            if r.returncode == 0:
                return
            err = r.stderr.decode(errors="replace").strip().splitlines()
            err = err[-1] if err else "?"
        except subprocess.TimeoutExpired:
            err = "probe timed out"
        if i == tries - 1:
            break  # let the real init raise the full error
        print(f"# backend probe failed ({err}); retry {i + 1}/{tries} "
              f"in {wait_s}s", flush=True)
        time.sleep(wait_s)


def _bench_eval(on_tpu: bool) -> float:
    """sec/frame on the PRODUCTION eval path: the bucketed Renderer
    (render/inference.py — quarter-octave ray bucket, masked style
    stats) at the test protocol's 256+256 sampling and 320x240
    (scripts/bench_render.py 'pallas-bucket' row). Marginal 2-vs-4
    frame timing cancels the tunnel dispatch cost. CPU CI fallback
    uses a tiny config so the line still prints everywhere."""
    import jax
    import jax.numpy as jnp

    from crnerf_tpu.config import Config
    from crnerf_tpu.render.inference import Renderer, bucket_size
    from crnerf_tpu.render.system import CrNerfSystem

    if on_tpu:
        cfg = Config(
            N_samples=256, N_importance=256, appearance_wh=(224, 160),
            compute_dtype="bfloat16", use_pallas=True,
        )
        w, h = 320, 240
    else:
        cfg = Config(
            N_samples=16, N_importance=16, netdepth=4, netwidth=64,
            nerf_out_dim=32, N_vocab=16, appearance_wh=(64, 48),
            chunk=4096,
        )
        w, h = 64, 48
    system = CrNerfSystem(cfg)
    variables = system.init(jax.random.PRNGKey(0))
    wa, ha = cfg.appearance_wh

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
        for i in range(k):
            out = fn(variables, rays_b, whole, uv_p, jnp.int32(n_pix),
                     jax.random.PRNGKey(i))
            float(out["rgb_fine"].sum())
        return time.perf_counter() - t0

    run_bucket(1)  # compile
    t1 = run_bucket(2)
    t2 = run_bucket(4)
    return (t2 - t1) / 2


def main():
    _wait_for_backend()
    import jax
    import jax.numpy as jnp

    from crnerf_tpu.utils.jit_cache import enable as enable_jit_cache

    enable_jit_cache()

    on_tpu = jax.devices()[0].platform != "cpu"

    from crnerf_tpu.config import Config
    from crnerf_tpu.data import TrainPipeline, make_synthetic_scene
    from crnerf_tpu.render.system import CrNerfSystem
    from crnerf_tpu.train.optim import make_optimizer
    from crnerf_tpu.train.state import TrainState
    from crnerf_tpu.train.step import make_train_step

    import os

    if on_tpu:
        cfg = Config(
            appearance_wh=(224, 160),
            compute_dtype="bfloat16",
            # G=32 exceeded v5e HBM before the fused render kernel removed
            # the per-point intermediates; CRNERF_BENCH_G to re-measure
            grids_per_step=int(os.environ.get("CRNERF_BENCH_G", 16)),
            # fused Pallas fwd+bwd beats the XLA path 58.9k vs 51.1k
            # rays/s (2026-08-16); CRNERF_BENCH_XLA=1 to A/B
            pallas_train=not bool(os.environ.get("CRNERF_BENCH_XLA")),
            # stash backward + chunked grad accumulation (A/B knobs;
            # defaults follow Config: stash on, chunks auto)
            pallas_stash=bool(int(os.environ.get("CRNERF_BENCH_STASH",
                                                 "1"))),
            grad_accum_chunks=int(os.environ.get("CRNERF_BENCH_CHUNKS",
                                                 "0")),
            # space-to-depth conv schedule for the appearance heads
            # (CRNERF_BENCH_S2D=1 to A/B; default follows Config)
            s2d_heads=bool(int(os.environ.get("CRNERF_BENCH_S2D", "0"))),
            s2d_stack=bool(int(os.environ.get("CRNERF_BENCH_S2D_STACK", "0"))),
            fold_heads=bool(int(os.environ.get("CRNERF_BENCH_FOLD", "0"))),
            # CRNERF_BENCH_HOIST=1 (+FOLD=1) A/Bs the hoisted-heads vjp;
            # fold+hoist = enc_a folded 4-D OUTSIDE the scan
            hoist_heads=bool(int(os.environ.get("CRNERF_BENCH_HOIST",
                                                "0"))),
            # sample_pdf gather realization (CRNERF_BENCH_PDF=maskreduce
            # to A/B; default follows Config)
            pdf_impl=os.environ.get("CRNERF_BENCH_PDF", "onehot"),
            # unrolled grad-accum chunk scan (CRNERF_BENCH_UNROLL=1 to A/B)
            chunk_unroll=bool(int(os.environ.get("CRNERF_BENCH_UNROLL",
                                                 "0"))),
            # appearance-vocab size: 1500 default (gate/sacre), 3200 for
            # the trevi envelope (reference command/train.sh:19); the
            # f32 cache is N_vocab x 32x32 x 64 = ~839 MB at 3200
            N_vocab=int(os.environ.get("CRNERF_BENCH_NVOCAB", "1500")),
        )
    else:  # CI fallback so the line always prints
        cfg = Config(
            batch_size=256, N_samples=16, N_importance=16,
            netdepth=4, netwidth=64, nerf_out_dim=32, N_vocab=16,
            appearance_wh=(64, 48), grids_per_step=2,
        )

    wa, ha = cfg.appearance_wh
    grids = max(1, cfg.grids_per_step)
    scene = make_synthetic_scene(
        n_train=4, n_test=1, img_wh=(112, 84), appearance_wh=(wa, ha)
    )
    pipe = TrainPipeline(scene, batch_size=cfg.batch_size)
    system = CrNerfSystem(cfg)

    variables = system.init(jax.random.PRNGKey(0))
    tx, sched = make_optimizer(cfg, pipe.iterations)
    state = TrainState.create(
        variables,
        tx.init(variables["params"]),
        n_vocab=cfg.N_vocab,
        embed_hw=32,
        embed_c=cfg.nerf_out_dim,
        rng=jax.random.PRNGKey(1),
    )
    train_step = make_train_step(
        system, tx, sched, grids_per_step=grids,
        grad_accum_chunks=cfg.resolved_chunks(),
        chunk_unroll=cfg.chunk_unroll)

    staged = {
        k: jnp.stack(
            [
                jnp.asarray(pipe.make_global_batch(0, i, grids)[k])
                for i in range(N_STAGED)
            ]
        )
        for k in pipe.make_global_batch(0, 0, grids)
    }
    staged = jax.device_put(staged)

    def run_steps(state, n_steps: int):
        def body(st, i):
            b = jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, i % N_STAGED, 0, keepdims=False
                ),
                staged,
            )
            st, m = train_step(st, b)
            return st, m["loss"]
        st, losses = jax.lax.scan(body, state, jnp.arange(n_steps))
        return jnp.sum(losses)

    run_k = jax.jit(lambda s: run_steps(s, K_STEPS))
    run_2k = jax.jit(lambda s: run_steps(s, 2 * K_STEPS))

    # Analytic model FLOPs (XLA cost analysis cannot see inside the Pallas
    # custom calls): MLP matmul MACs x 2, per point, coarse + fine passes.
    # Backward multiplier: 2x fwd for the grad matmuls, +1x recompute
    # unless the stash backward is on (ops/fused_render.py).
    def _mlp_flops_per_point(tree):
        return 2.0 * float(sum(
            np.asarray(v).size
            for k, v in jax.tree_util.tree_leaves_with_path(tree)
            if "kernel" in str(k[-1])
        ))

    fwd_pp_c = _mlp_flops_per_point(variables["params"]["nerf_coarse"])
    fwd_pp_f = _mlp_flops_per_point(
        variables["params"].get("nerf_fine", {})
    )
    pts_c = cfg.batch_size * grids * cfg.N_samples
    pts_f = cfg.batch_size * grids * (cfg.N_samples + cfg.N_importance)
    # stash only runs when the Pallas train path itself is on — the XLA
    # A/B path (CRNERF_BENCH_XLA=1) recomputes via remat regardless of
    # cfg.pallas_stash
    bwd_mult = 3.05 if (cfg.pallas_stash and cfg.pallas_train) else 4.0
    step_flops = bwd_mult * (pts_c * fwd_pp_c + pts_f * fwd_pp_f)

    reps = int(os.environ.get("CRNERF_BENCH_REPS", "3"))
    float(run_k(state))   # warm both compiles + force execution
    float(run_2k(state))
    per_steps = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run_k(state))
        t_k = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run_2k(state))
        t_2k = time.perf_counter() - t0
        per_steps.append(max(t_2k - t_k, 1e-9) / K_STEPS)

    rays_reps = sorted(cfg.batch_size * grids / p for p in per_steps)
    rays_per_sec = rays_reps[len(rays_reps) // 2]  # median
    spread = (rays_reps[-1] - rays_reps[0]) / rays_per_sec
    per_step = cfg.batch_size * grids / rays_per_sec
    tflops = step_flops / per_step / 1e12
    peak = 172.5 if on_tpu else 0.0  # measured v5e bf16 (BASELINE.md)

    eval_spf = None
    if not os.environ.get("CRNERF_BENCH_NO_EVAL"):
        eval_spf = _bench_eval(on_tpu)

    # HBM envelope to stderr (the stdout contract is ONE JSON line):
    # peak_bytes_in_use captures the train step + staged batches; used for
    # the trevi N_vocab=3200 fit row in BASELINE.md
    import sys

    try:
        ms = jax.devices()[0].memory_stats() or {}
        if ms.get("peak_bytes_in_use"):  # axon tunnel reports zeros
            print(
                f"# hbm peak={ms['peak_bytes_in_use'] / 2**30:.2f} GiB"
                f" in_use={ms.get('bytes_in_use', 0) / 2**30:.2f} GiB"
                f" limit={ms.get('bytes_limit', 0) / 2**30:.2f} GiB"
                f" (N_vocab={cfg.N_vocab})",
                file=sys.stderr, flush=True,
            )
    except Exception:
        pass  # memory_stats unsupported on some backends

    from datetime import datetime, timezone

    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "median": round(rays_per_sec, 1),
        "spread": round(spread, 4),
        "reps": reps,
        "hour": datetime.now(timezone.utc).isoformat(timespec="minutes"),
        "eval_s_per_frame": (
            round(eval_spf, 3) if eval_spf is not None else None
        ),
        "tflops": round(tflops, 1),
        "mfu": round(tflops / peak, 3) if peak else None,
    }))


if __name__ == "__main__":
    main()
