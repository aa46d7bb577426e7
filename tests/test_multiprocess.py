"""True multi-process data parallelism: 2 jax.distributed CPU processes x
2 virtual devices each run the REAL Trainer over one 4-device mesh.

The single-process 8-device mesh tests (tests/test_train.py) prove the
shard_map math; this proves the PROCESS-boundary concerns the reference
leaves to Lightning DDP (SURVEY.md §2.9/§5.8): jax.distributed bring-up,
global-batch device_put from host-identical copies, orbax collective
checkpointing + restore with process_count > 1, and rank-zero-only logging
(tests/multiprocess_worker.py has the worker-side detail).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "multiprocess_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(tmp_path, extra_args=(), num_processes=2,
                 timeout=1200):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the worker sets its own per-process device count
    env.pop("XLA_FLAGS", None)
    # `python tests/multiprocess_worker.py` puts tests/ (the script dir),
    # not the cwd, on sys.path — make crnerf_tpu importable without
    # requiring a pip install of the package
    inherited = env.get("PYTHONPATH")
    env["PYTHONPATH"] = (
        ROOT + os.pathsep + inherited if inherited else ROOT
    )
    save_dir = tmp_path / "run"  # shared dir, as on a real multi-host fs
    procs, out_paths, log_files = [], [], []
    for pid in range(num_processes):
        out = tmp_path / f"result_{pid}.json"
        out_paths.append(out)
        # logs go to FILES, not PIPEs: communicate() below drains one
        # process at a time, and a later worker blocking on a full
        # 64 KB stdout pipe would stall its collectives until the
        # earlier ones hit the distributed shutdown barrier timeout
        lf = open(tmp_path / f"worker_{pid}.log", "w+")
        log_files.append(lf)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, WORKER,
                    "--coordinator", f"127.0.0.1:{port}",
                    "--process_id", str(pid),
                    "--num_processes", str(num_processes),
                    "--save_dir", str(save_dir),
                    "--out", str(out),
                    *extra_args,
                ],
                cwd=ROOT,
                env=env,
                stdout=lf,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = []
    try:
        for p in procs:
            # 4 workers x (train step + val render + restore) compiles:
            # 1-4 min each on a cold cache under CI load (possibly one
            # shared core — see the worker's distributed timeouts); the
            # slab leg compiles a scan-of-steps program (~2x the step's
            # compile) and passes a bigger budget
            p.wait(timeout=timeout)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for lf in log_files:
            lf.flush()
            lf.seek(0)
            logs.append(lf.read())
            lf.close()
    assert all(p.returncode == 0 for p in procs), (
        "worker failed:\n" + "\n=== next worker ===\n".join(logs)
    )
    results = [json.loads(o.read_text()) for o in out_paths]
    if num_processes == 2:
        return results[0], results[1], save_dir
    return results, save_dir


@pytest.mark.slow
def test_two_process_trainer(tmp_path):
    r0, r1, save_dir = _run_workers(tmp_path)
    # replicated state is bit-identical across processes after psum'd steps
    assert r0["params_sha"] == r1["params_sha"]
    assert r0["step"] == r1["step"] > 0
    # collective orbax save + restore round-trips on both processes
    assert r0["restored_step"] == r1["restored_step"] == r0["step"]
    # the sharded validation render agrees
    assert r0["val_psnr"] == pytest.approx(r1["val_psnr"], abs=1e-3)
    assert r0["val_psnr"] > 5.0
    # appearance-cache writes happened (all_gather path crossed processes)
    assert r0["cache_writes"] == r1["cache_writes"] > 0

    # rank-zero artifacts exist exactly where process 0 put them
    ckpt_dir = save_dir / "ckpts" / "mp"
    assert (ckpt_dir / "weights.npz").exists()
    assert (save_dir / "logs" / "mp" / "metrics.jsonl").exists()


@pytest.mark.slow
def test_two_process_preemption_sync(tmp_path):
    """Cluster-style preemption across processes: SIGTERM lands on ONE
    process; jax.distributed's sync manager propagates the notice, both
    processes agree on the SAME stop step (Trainer._should_stop polls the
    preemption sync point every step — a per-process flag would desync
    the collectives), checkpoint collectively, and exit 0. Restore works
    on both."""
    r0, r1, save_dir = _run_workers(tmp_path, ("--preempt_at", "5"))
    assert r0["stopped"] and r1["stopped"]
    # the agreed stop step is identical and past the notice step
    assert r0["step"] == r1["step"] >= 5
    assert r0["params_sha"] == r1["params_sha"]
    # the preemption checkpoint restores on both processes
    assert r0["restored_step"] == r1["restored_step"] == r0["step"]
    assert (save_dir / "ckpts" / "mp" / "weights.npz").exists()


@pytest.mark.slow
def test_four_process_trainer_g2(tmp_path):
    """4 jax.distributed processes x 2 local devices x G=2 grids/device:
    the flagship multi-chip layout (D=8 global devices folding 16 grids
    per step) with the mesh crossing THREE process boundaries. Replica
    identity, collective checkpoint round-trip, and cross-process
    embedding-cache all_gathers must all hold at G>1."""
    results, save_dir = _run_workers(
        tmp_path, ("--grids_per_step", "2"), num_processes=4
    )
    shas = {r["params_sha"] for r in results}
    assert len(shas) == 1, "replicated state diverged across processes"
    steps = {r["step"] for r in results}
    assert steps == {results[0]["step"]} and results[0]["step"] > 0
    for r in results:
        assert r["restored_step"] == r["step"]
        assert r["cache_writes"] == results[0]["cache_writes"] > 0
        assert r["val_psnr"] == pytest.approx(
            results[0]["val_psnr"], abs=1e-3
        )
    assert (save_dir / "ckpts" / "mp" / "weights.npz").exists()


@pytest.mark.slow
def test_four_process_slab_dispatch_with_preemption(tmp_path):
    """4 processes x 2 devices x G=2 with --steps_per_dispatch 2: the
    production-recommended SLAB feeding mode (shard_train_scan + the
    device-resident data gathers) under TRUE jax.distributed, with the
    preemption SIGTERM landing on rank 2 after two dispatches. The stop
    must land at the SAME slab boundary on every process (the sync point
    is polled per slab), checkpoint collectively, and restore exactly
    (r4 verdict directive 3: slab x distributed were previously only
    proven separately)."""
    # slab == steps/epoch (3 on this scene at D=8 x G=2) so only ONE
    # scan shape compiles (no remainder program), and per-epoch val is
    # off (covered by the other 4-proc tests): 4 workers compiling a
    # scan-of-steps program on one shared CI core is the cost ceiling
    # here, so the leg trims every program that is not its target
    results, save_dir = _run_workers(
        tmp_path,
        ("--steps_per_dispatch", "3", "--grids_per_step", "2",
         "--preempt_at", "2", "--preempt_rank", "2",
         "--val_every_epochs", "0"),
        num_processes=4, timeout=2200,
    )
    assert all(r["stopped"] for r in results)
    steps = {r["step"] for r in results}
    assert len(steps) == 1 and results[0]["step"] >= 3
    assert len({r["params_sha"] for r in results}) == 1
    for r in results:
        assert r["restored_step"] == r["step"]
        assert r["cache_writes"] == results[0]["cache_writes"] > 0
    assert (save_dir / "ckpts" / "mp" / "weights.npz").exists()


@pytest.mark.slow
def test_four_process_preemption_rank1_exact_resume(tmp_path):
    """Preemption SIGTERM lands on rank 1 (NOT the coordinator/primary)
    of a 4-process G=2 run: the sync manager must still propagate the
    notice, all four processes agree on one stop step, checkpoint
    collectively, and a fresh Trainer restores that exact step on every
    process (exact mid-epoch resume under multi-process preemption)."""
    results, save_dir = _run_workers(
        tmp_path,
        ("--preempt_at", "5", "--preempt_rank", "1",
         "--grids_per_step", "2"),
        num_processes=4,
    )
    assert all(r["stopped"] for r in results)
    steps = {r["step"] for r in results}
    assert len(steps) == 1 and results[0]["step"] >= 5
    assert len({r["params_sha"] for r in results}) == 1
    for r in results:
        assert r["restored_step"] == r["step"]
    assert (save_dir / "ckpts" / "mp" / "weights.npz").exists()
