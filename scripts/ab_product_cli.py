"""Interleaved PRODUCT-CLI throughput A/Bs (r4 verdict directive 1).

The round-4 gap: the product CLI in slab mode logged ~100.5k rays/s
(results/SLAB_TPU.md, contended host) vs the 165.8k bench ceiling
(BENCH_r04), with the residual unattributed. Each leg here runs the REAL
``python -m crnerf_tpu train`` CLI on the rehearsal scene at flagship
shapes (the SLAB_TPU.md command) and reads the Trainer-logged
``train/rays_per_sec`` rows from metrics.jsonl (epoch wall-clock
INCLUDING the in-flight tail since the r5 drain fix — honest rates).

Legs (one knob each, vs the r4 'host' baseline):
  host     — slab staging ships full (rays, ts, rgbs) per step (r4 mode)
  device   — Config.slab_data='device': resident HBM ray/rgb buffers,
             only int32 indices staged (~8x less tunnel traffic)
  noval    — device + --val_every_epochs 0 (epoch-boundary val render off)
  slab250  — device + --steps_per_dispatch 250 (half the dispatches)

Runs are INTERLEAVED (e.g. host,device,host,device): tunnel-hour
variance swamps single runs (BASELINE.md: identical eval work spreads
42-389 s across minutes) — only adjacent pairs decide.

Usage:
  python scripts/ab_product_cli.py --seq host,device,host,device \
      [--epochs 2] [--root /tmp/rehearsal_scene]
  # appends rows to results/AB_PRODUCT_CLI.jsonl and prints a table
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEGS = {
    "host": ["--slab_data", "host"],
    "device": ["--slab_data", "device"],
    "noval": ["--slab_data", "device", "--val_every_epochs", "0"],
    "slab250": ["--slab_data", "device", "--steps_per_dispatch", "250"],
    "slab62": ["--slab_data", "device", "--steps_per_dispatch", "62"],
}


def run_leg(name: str, idx: int, args) -> dict:
    exp = f"ab_{name}_{idx}"
    save = os.path.join(args.save_root, exp)
    cmd = [
        sys.executable, "-m", "crnerf_tpu", "train",
        "--root_dir", args.root,
        "--dataset_name", "phototourism",
        "--scene_name", "rehearsal_brandenburg_gate",
        "--img_downscale", "2", "--N_vocab", "1500",
        "--grids_per_step", "16", "--compute_dtype", "bfloat16",
        "--num_epochs", str(args.epochs),
        "--appearance_wh", "224", "160",
        "--steps_per_dispatch", "125",
        "--exp_name", exp, "--save_dir", save,
    ] + LEGS[name]
    t0 = time.perf_counter()
    log_path = os.path.join(args.save_root, f"{exp}.log")
    os.makedirs(args.save_root, exist_ok=True)
    with open(log_path, "w") as lf:
        r = subprocess.run(cmd, cwd=REPO, stdout=lf,
                           stderr=subprocess.STDOUT,
                           timeout=args.timeout)
    wall = time.perf_counter() - t0
    rps, epochs = [], []
    metrics = os.path.join(save, "logs", exp, "metrics.jsonl")
    if os.path.exists(metrics):
        with open(metrics) as f:
            for line in f:
                d = json.loads(line)
                if "train/rays_per_sec" in d:
                    rps.append(round(float(d["train/rays_per_sec"])))
                    epochs.append(d.get("train/epoch"))
    row = {
        "leg": name, "i": idx, "rays_per_sec": rps,
        "steady": rps[-1] if rps else None,
        "wall_s": round(wall, 1), "rc": r.returncode,
        "utc": time.strftime("%H:%M", time.gmtime()),
    }
    print(json.dumps(row), flush=True)
    if r.returncode != 0:
        print(f"  leg FAILED; tail of {log_path}:", flush=True)
        with open(log_path) as lf:
            print("".join(lf.readlines()[-15:]), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", default="host,device,host,device")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--root", default="/tmp/rehearsal_scene")
    ap.add_argument("--save_root", default="/tmp/ab_cli")
    ap.add_argument("--timeout", type=int, default=4200)
    ap.add_argument("--out", default=os.path.join(
        REPO, "results", "AB_PRODUCT_CLI.jsonl"))
    args = ap.parse_args()

    rows = []
    for i, name in enumerate(args.seq.split(",")):
        name = name.strip()
        assert name in LEGS, f"unknown leg {name!r} (have {list(LEGS)})"
        rows.append(run_leg(name, i, args))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"appended {len(rows)} rows -> {args.out}")


if __name__ == "__main__":
    main()
