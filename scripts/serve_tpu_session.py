"""Drive the render server against the REAL TPU chip and record the
per-request timings + compile-cache behavior (results/SERVE_TPU.md).

Round-3 shipped apps/serve.py CPU-tested only; the whole point of the
resident design is the tunnel's per-shape compile cost, so this session
proves it where it matters: starts the server in a subprocess on the TPU,
runs a scripted client session (ping, encode_style, renders across two
quarter-octave buckets incl. same-bucket reuse, render_path, stats), and
writes the observed latencies.

Usage:
  python scripts/serve_tpu_session.py --ckpt_path <dir-with-weights.npz> \
      [--out results/SERVE_TPU.md]
If --ckpt_path is omitted, a full-size random-init weights.npz is
exported to a temp dir first (timing/compile behavior is weight-blind).
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _export_random_ckpt(tmp: str) -> str:
    import jax

    from crnerf_tpu.config import Config
    from crnerf_tpu.render.system import CrNerfSystem
    from crnerf_tpu.utils.checkpoint import save_weights_only
    from crnerf_tpu.train.state import TrainState

    cfg = Config(appearance_wh=(224, 160), use_mask=False,
                 encode_random=False)
    variables = CrNerfSystem(cfg).init(jax.random.PRNGKey(0))
    state = TrainState.create(
        variables, opt_state=(), n_vocab=cfg.N_vocab, embed_hw=32,
        embed_c=cfg.nerf_out_dim, rng=jax.random.PRNGKey(1),
    )
    os.makedirs(tmp, exist_ok=True)
    path = os.path.join(tmp, "weights.npz")
    save_weights_only(jax.device_get(state), path)
    return tmp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_path", default="")
    ap.add_argument("--out", default=os.path.join(REPO, "results",
                                                  "SERVE_TPU.md"))
    ap.add_argument("--n_samples", type=int, default=256)
    ap.add_argument("--warmup", default="",
                    help="comma list of WxH sizes the server pre-compiles "
                         "BEFORE accepting connections (apps/serve.py "
                         "--warmup); with the persistent jit cache this "
                         "makes the first client render warm "
                         "(r4 directive 7)")
    args = ap.parse_args()

    ckpt = args.ckpt_path or _export_random_ckpt("/tmp/serve_tpu_ckpt")
    port = _free_port()
    log_path = "/tmp/serve_tpu_server.log"
    log = open(log_path, "w")
    t_start = time.perf_counter()
    proc = subprocess.Popen(
        [sys.executable, "-m", "crnerf_tpu", "serve",
         "--ckpt_path", ckpt, "--port", str(port),
         "--N_samples", str(args.n_samples),
         "--N_importance", str(args.n_samples)]
        + (["--warmup", args.warmup] if args.warmup else []),
        cwd=REPO, stdout=log, stderr=subprocess.STDOUT,
    )

    from crnerf_tpu.apps.serve import request  # client side only (no jax)

    def req(r, timeout=1800.0):
        t0 = time.perf_counter()
        resp = request("127.0.0.1", port, r, timeout=timeout)
        wall = time.perf_counter() - t0
        return resp, wall

    session = []

    def record(label, r, wall):
        row = {"req": label, "wall_s": round(wall, 3), "ok": r.get("ok")}
        for k in ("ms", "bucket", "compiled", "frames", "ms_total"):
            if k in r:
                row[k] = r[k]
        session.append(row)
        print(json.dumps(row), flush=True)
        assert r.get("ok"), r

    try:
        # wait for the server to come up (TPU backend init over tunnel)
        deadline = time.time() + 900
        while True:
            try:
                r, wall = req({"op": "ping"}, timeout=30)
                break
            except (ConnectionError, OSError):
                if time.time() > deadline:
                    raise RuntimeError(
                        f"server never came up; log: {log_path}"
                    )
                time.sleep(5)
        startup_s = time.perf_counter() - t_start
        record("ping (server up)", r, wall)
        session.append({
            "req": "(startup: launch -> first ping"
                   + (f", warmup={args.warmup})" if args.warmup else ")"),
            "wall_s": round(startup_s, 1), "ok": True,
        })

        # style: synthesize one (styles need only be a valid image file)
        import numpy as np
        import imageio.v2 as imageio

        style = "/tmp/serve_tpu_style.png"
        rng = np.random.default_rng(0)
        imageio.imwrite(
            style, rng.integers(0, 255, (160, 224, 3), np.uint8)
        )
        r, wall = req({"op": "encode_style", "id": "s", "image_path": style})
        record("encode_style", r, wall)

        # bucket A: 320x240 — compiles unless pre-warmed (--warmup)
        r, wall = req(_rr(320, 240))
        warmed = "320x240" in args.warmup
        record(
            "render 320x240 (warm-started)" if warmed
            else "render 320x240 (cold: compile)", r, wall,
        )
        if warmed:
            assert not r["compiled"], "warmup should have precompiled"
            assert wall < 5.0, (
                f"first warm request took {wall:.1f}s (>5s budget)"
            )
        # all inside the 81,920-ray bucket (1.25 * 2^16; px <= 81,920)
        for i, (w, h) in enumerate([(320, 240), (300, 225), (326, 244)]):
            r, wall = req(_rr(w, h))
            record(f"render {w}x{h} (same bucket, warm)", r, wall)
            assert not r["compiled"], "unexpected recompile in-bucket"

        # bucket B: 480x360 — one compile, one reuse
        r, wall = req(_rr(480, 360))
        record("render 480x360 (cold: compile)", r, wall)
        r, wall = req(_rr(500, 375))
        record("render 500x375 (same bucket, warm)", r, wall)

        # path render: 8 frames through the warm 320x240 bucket
        r, wall = req({
            "op": "render_path", "scene": "brandenburg_gate",
            "n_frames": 8, "wh": [320, 240], "style_id": "s",
            "out_dir": "/tmp/serve_tpu_frames",
        })
        record("render_path 8 frames 320x240", r, wall)

        r, wall = req({"op": "stats"})
        record("stats", r, wall)
        stats = r

        r, wall = req({"op": "shutdown"})
        record("shutdown", r, wall)
        proc.wait(timeout=120)
    finally:
        if proc.poll() is None:
            proc.terminate()
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
        log.close()

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    lines = [
        "# Render server on the real TPU chip",
        "",
        f"Scripted session via `scripts/serve_tpu_session.py` "
        f"(ckpt: `{ckpt}`, N={args.n_samples}+{args.n_samples}; server "
        "log: /tmp/serve_tpu_server.log). `wall_s` is the CLIENT-side "
        "request wall clock over loopback TCP (includes the ~1-2 s "
        "tunnel dispatch); `ms` is the server-side render time.",
        "",
        "| request | wall s | server ms | bucket | compiled |",
        "|---|---|---|---|---|",
    ]
    for row in session:
        lines.append(
            f"| {row['req']} | {row['wall_s']} | {row.get('ms', '—')} | "
            f"{row.get('bucket', '—')} | {row.get('compiled', '—')} |"
        )
    lines += [
        "",
        f"Final stats: `{json.dumps({k: v for k, v in stats.items() if k != 'ok'})}`",
        "",
        "Takeaway: within a quarter-octave bucket every request after the",
        "first hits the compiled executable (`compiled: false` rows), so a",
        "resident server amortizes the multi-minute tunnel compile across",
        "arbitrarily many mixed-size requests — the capability the",
        "reference's reload-per-invocation eval/video scripts lack.",
        "",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out}")


def _rr(w, h):
    return {"op": "render", "wh": [w, h],
            "c2w": [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]],
            "fov": 60.0, "style_id": "s", "inline": False,
            "out_path": f"/tmp/serve_tpu_render_{w}x{h}.png"}


if __name__ == "__main__":
    main()
