"""Persistent render server: the production-serving front end.

The reference has no serving story — eval.py / appearance_modification_
video.py (SURVEY.md §2.6) reload the checkpoint and pay model setup per
process, and on TPU a fresh process would also pay the multi-minute XLA
compile per image shape. This app keeps one model resident and serves
renders over a line-delimited-JSON TCP protocol, reusing the bucketed
``Renderer`` so every request within a 2x pixel band after the first hits
an already-compiled executable (render/inference.py).

Protocol: one JSON object per line, one JSON reply per line.

  {"op": "ping"}
  {"op": "encode_style", "id": "starry", "image_path": "a.png"}
  {"op": "render", "c2w": [[...3 rows x 4...]], "wh": [W, H],
   "fov": 60.0,                 # or "K": [[3x3]]
   "near": 0.0, "far": 5.0,     # optional; demo-standard 0/5 default
                                # (reference datasets/PhototourismDataset.py:14-16)
   "style_id": "starry",        # or "style_image": "a.png"
   "out_path": "f.png"}         # or "inline": true -> base64 PNG
  {"op": "render_path", "scene": "brandenburg_gate", "n_frames": 24,
   "wh": [W, H], "style_id": "starry", "out_dir": "frames/"}
  {"op": "stats"}
  {"op": "shutdown"}

Every reply carries {"ok": true/false}; render replies add wall-clock
"ms", the ray "bucket" used, and whether that bucket was a fresh compile.
Requests are served by a thread pool but renders serialize on one lock
(one chip); the compile caches make concurrent mixed-size clients cheap.

Trust model: requests carry filesystem paths (image_path, out_path,
out_dir). The default bind is loopback, where the client IS the server
user. When serving non-loopback (``--host 0.0.0.0``) you MUST pass
``--root DIR``: every network-supplied path is then resolved with
``os.path.realpath`` and refused unless it stays under DIR (symlink
escapes included). Without --root, a non-loopback bind is refused at
startup.

Run:  python -m crnerf_tpu serve --ckpt_path out/ckpts/exp --port 7060 \
          --warmup 320x240
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import socket
import socketserver
import threading
import time
from typing import Dict, Optional, Sequence

import numpy as np

from crnerf_tpu.config import Config
from crnerf_tpu.render.camera_path import (
    DEMO_ANCHORS,
    PATH_PRESETS,
    fov_intrinsics,
    resolve_scene,
)
from crnerf_tpu.render.inference import Renderer, bucket_size


class ServeError(ValueError):
    """Client error: reported in the JSON reply, never kills the server."""


def _png_bytes(rgb: np.ndarray) -> bytes:
    """uint8 passes through (device-quantized frames); float is [0,1]."""
    import imageio.v2 as imageio

    if rgb.dtype != np.uint8:
        rgb = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
    buf = io.BytesIO()
    imageio.imwrite(buf, rgb, format="png")
    return buf.getvalue()


class RenderService:
    """The socket-free core: one resident model + compile/style caches.

    Kept separate from the TCP layer so tests (and embedders) can drive
    ``handle(dict) -> dict`` directly.
    """

    def __init__(self, cfg: Config, variables: Dict,
                 root: Optional[str] = None):
        self.cfg = cfg
        self.renderer = Renderer(cfg, variables)
        self.styles: Dict[str, np.ndarray] = {}
        self.lock = threading.Lock()  # one chip: renders serialize
        self.n_renders = 0
        self.render_ms: list = []
        self._shutdown = threading.Event()
        # Sandbox for network-supplied paths (see module docstring).
        self.root = os.path.realpath(root) if root else None

    # ----------------------------------------------------------- helpers
    def _check_path(self, path: str) -> str:
        """Resolve a network-supplied path against the --root sandbox.

        With no root configured (loopback trust model) paths pass
        through. With a root, the realpath (symlinks resolved) must stay
        under it; for to-be-created files the nearest existing ancestor
        is what realpath resolves, which is exactly the escape surface.
        """
        if self.root is None:
            return path
        real = os.path.realpath(path)
        if real != self.root and not real.startswith(self.root + os.sep):
            raise ServeError(
                f"path {path!r} escapes the server --root sandbox"
            )
        return real

    def _load_style(self, path: str) -> np.ndarray:
        from crnerf_tpu.apps.video import _load_style

        path = self._check_path(path)
        if not os.path.exists(path):
            raise ServeError(f"style image not found: {path}")
        return _load_style(path, self.cfg.appearance_wh)

    def _style_from(self, req: Dict) -> np.ndarray:
        if "style_id" in req:
            try:
                return self.styles[req["style_id"]]
            except KeyError:
                raise ServeError(
                    f"unknown style_id {req['style_id']!r}; "
                    f"known: {sorted(self.styles)}"
                ) from None
        if "style_image" in req:
            return self._load_style(req["style_image"])
        raise ServeError("request needs style_id or style_image")

    def _cam_from(self, req: Dict) -> tuple:
        try:
            w, h = (int(x) for x in req["wh"])
            c2w = np.asarray(req["c2w"], np.float32)
        except (KeyError, TypeError, ValueError) as e:
            raise ServeError(f"bad/missing wh or c2w: {e}") from None
        if c2w.shape != (3, 4):
            raise ServeError(f"c2w must be 3x4, got {c2w.shape}")
        if "K" in req:
            K = np.asarray(req["K"], np.float32)
            if K.shape != (3, 3):
                raise ServeError(f"K must be 3x3, got {K.shape}")
        else:
            K = fov_intrinsics((w, h), float(req.get("fov", 60.0)))
        near = float(req.get("near", 0.0))
        far = float(req.get("far", 5.0))
        return c2w, K, near, far, (h, w)

    def _render(self, cam, style, hw) -> Dict:
        c2w, K, near, far = cam
        # cache key mirrors the dispatch route in render_frame_cam_async:
        # bucketed cam program when eval_bucket is on, else the exact
        # per-resolution program (advisor r4: checking only the
        # bucket_cam key misreported compiled/bucket with bucketing off)
        if self.cfg.eval_bucket:
            p = self.renderer.bucket_for(hw[0] * hw[1])
            kind = (
                "bucket_cam_sh" if self.renderer._n_shard > 1
                else "bucket_cam"
            )
            cache_key = (kind, p, "rgb_u8")
        else:
            p = None
            cache_key = ("exact", tuple(hw), "rgb_u8")
        fresh = cache_key not in self.renderer._cache
        t0 = time.perf_counter()
        # camera-in + uint8-out: requests ship ~40 bytes of camera params
        # (rays generated in the bucketed program) and the reply fetch is
        # the quantized image (~20x smaller than float rgb+depth+mask) —
        # both directions of the tunnel round-trip minimized
        # (render/inference.py _fn_bucketed_cam / _select)
        out = self.renderer.fetch(
            self.renderer.render_frame_cam_async(
                c2w, K, near, far, hw, style, outputs="rgb_u8"
            )
        )
        ms = (time.perf_counter() - t0) * 1e3
        self.n_renders += 1
        self.render_ms.append(ms)
        return {
            "rgb": out["rgb_u8"], "ms": round(ms, 2), "bucket": p,
            "compiled": fresh,
        }

    # --------------------------------------------------------------- ops
    def op_ping(self, req):
        import jax

        return {
            "device": jax.devices()[0].platform,
            "buckets": self.renderer.stats()["buckets"],
            "styles": sorted(self.styles),
        }

    def op_encode_style(self, req):
        if "id" not in req or "image_path" not in req:
            raise ServeError("encode_style needs id and image_path")
        self.styles[str(req["id"])] = self._load_style(req["image_path"])
        return {"styles": sorted(self.styles)}

    def op_render(self, req):
        if not req.get("inline") and "out_path" not in req:
            raise ServeError("render needs inline:true and/or out_path")
        c2w, K, near, far, hw = self._cam_from(req)
        style = self._style_from(req)
        with self.lock:
            r = self._render((c2w, K, near, far), style, hw)
        resp = {"ms": r["ms"], "bucket": r["bucket"],
                "compiled": r["compiled"], "wh": [hw[1], hw[0]]}
        if req.get("inline"):
            resp["png_b64"] = base64.b64encode(
                _png_bytes(r["rgb"])
            ).decode("ascii")
        if "out_path" in req:
            out_path = self._check_path(req["out_path"])
            os.makedirs(
                os.path.dirname(os.path.abspath(out_path)),
                exist_ok=True,
            )
            with open(out_path, "wb") as f:
                f.write(_png_bytes(r["rgb"]))
            resp["out_path"] = out_path
        return resp

    def op_render_path(self, req):
        if "out_dir" not in req:
            raise ServeError("render_path needs out_dir")
        style = self._style_from(req)
        w, h = (int(x) for x in req.get("wh", (320, 240)))
        scene = str(req.get("scene", ""))
        key = resolve_scene(scene)
        spec = PATH_PRESETS[key]
        if "n_frames" in req:
            spec = type(spec)(**{
                **{f.name: getattr(spec, f.name)
                   for f in spec.__dataclass_fields__.values()},
                "n_frames": int(req["n_frames"]),
            })
        anchor = (
            np.asarray(req["c2w"], np.float32)
            if "c2w" in req else DEMO_ANCHORS.get(key)
        )
        if anchor is None:
            raise ServeError(f"no demo anchor for {key}; pass c2w")
        out_dir = self._check_path(req["out_dir"])
        os.makedirs(out_dir, exist_ok=True)
        frames, t0 = [], time.perf_counter()
        K = fov_intrinsics((w, h), float(req.get("fov", 60.0)))
        near = float(req.get("near", 0.0))
        far = float(req.get("far", 5.0))
        for i, c2w in enumerate(spec.poses(anchor)):
            with self.lock:  # per-frame: single renders can interleave
                r = self._render((c2w, K, near, far), style, (h, w))
            with open(
                os.path.join(out_dir, f"{i:03d}.png"), "wb"
            ) as f:
                f.write(_png_bytes(r["rgb"]))
            frames.append(r["rgb"])  # already device-quantized uint8
        import imageio.v2 as imageio

        gif = os.path.join(out_dir, f"{key}.gif")
        imageio.mimsave(gif, frames, fps=30)
        return {
            "frames": len(frames), "out_dir": out_dir, "gif": gif,
            "ms_total": round((time.perf_counter() - t0) * 1e3, 1),
        }

    def op_stats(self, req):
        ms = sorted(self.render_ms)
        pct = (
            lambda q: round(ms[min(len(ms) - 1, int(q * len(ms)))], 2)
        ) if ms else (lambda q: None)
        return {
            "renders": self.n_renders,
            "p50_ms": pct(0.50), "p95_ms": pct(0.95),
            "buckets_compiled": self.renderer.stats()["buckets"],
            "styles": sorted(self.styles),
        }

    def op_shutdown(self, req):
        self._shutdown.set()
        return {"shutting_down": True}

    def handle(self, req) -> Dict:
        if not isinstance(req, dict):
            return {"ok": False, "error": "request must be a JSON object"}
        op = req.get("op")
        fn = {
            "ping": self.op_ping, "encode_style": self.op_encode_style,
            "render": self.op_render,
            "render_path": self.op_render_path,
            "stats": self.op_stats, "shutdown": self.op_shutdown,
        }.get(op)
        if fn is None:
            return {"ok": False, "error": f"unknown op {op!r}"}
        try:
            resp = fn(req)
        except ServeError as e:
            return {"ok": False, "error": str(e)}
        except Exception as e:  # server must survive a bad request
            return {"ok": False, "error": f"{type(e).__name__}: {e}"}
        resp["ok"] = True
        return resp


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        svc: RenderService = self.server.service  # type: ignore[attr-defined]
        for raw in self.rfile:
            raw = raw.strip()
            if not raw:
                continue
            try:
                req = json.loads(raw)
            except json.JSONDecodeError as e:
                resp = {"ok": False, "error": f"bad json: {e}"}
            else:
                resp = svc.handle(req)
            self.wfile.write(
                (json.dumps(resp) + "\n").encode("utf-8")
            )
            self.wfile.flush()
            if svc._shutdown.is_set():
                # shut down from OUTSIDE the handler thread (shutdown()
                # joins the serve loop and would deadlock called inline)
                threading.Thread(
                    target=self.server.shutdown, daemon=True
                ).start()
                return


def warmup(svc: RenderService, sizes: str) -> None:
    """Pre-compile the named WxH buckets BEFORE the server accepts
    connections (r4 verdict directive 7), then zero the latency stats:
    warmup renders are compile-dominated and would skew op_stats'
    p50/p95 (seen in the first recorded TPU session — the 81 s p95 in
    results/SERVE_TPU_WARM.md spans the pre-bind compile, not any
    client-visible request)."""
    ww, wh_ = svc.cfg.appearance_wh
    for size in filter(None, sizes.split(",")):
        w, h = (int(x) for x in size.lower().split("x"))
        style = np.zeros((1, wh_, ww, 3), np.float32)
        c2w, K, near, far, hw = svc._cam_from({
            "wh": [w, h],
            "c2w": np.eye(3, 4, dtype=np.float32).tolist(),
        })
        svc._render((c2w, K, near, far), style, hw)
        print(f"warmup {w}x{h}: bucket {bucket_size(w * h)} compiled",
              flush=True)
    svc.n_renders = 0
    svc.render_ms.clear()


class Server(socketserver.ThreadingTCPServer):
    daemon_threads = True
    allow_reuse_address = True

    def __init__(self, svc: RenderService, host="127.0.0.1", port=0):
        super().__init__((host, port), _Handler)
        self.service = svc


def request(host: str, port: int, req: Dict, timeout=600.0,
            max_reply_bytes=256 << 20) -> Dict:
    """One-shot client helper (used by tests and scripts/serve_client.py).

    Raises ConnectionError if the server closes mid-reply (instead of
    surfacing a JSONDecodeError on a truncated buffer) and bounds the
    reply buffer (inline base64 PNGs are multi-MB; anything past
    ``max_reply_bytes`` indicates a runaway peer, not a render).
    """
    with socket.create_connection((host, port), timeout=timeout) as s:
        s.sendall((json.dumps(req) + "\n").encode("utf-8"))
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = s.recv(65536)
            if not chunk:
                raise ConnectionError(
                    "server closed connection mid-reply "
                    f"({len(buf)} bytes buffered, no trailing newline)"
                )
            buf += chunk
            if len(buf) > max_reply_bytes:
                raise ConnectionError(
                    f"reply exceeds {max_reply_bytes} bytes without a "
                    "newline; aborting"
                )
    return json.loads(buf.decode("utf-8"))


def main(argv: Optional[Sequence[str]] = None):
    from crnerf_tpu.utils.jit_cache import enable as enable_jit_cache

    enable_jit_cache()
    p = argparse.ArgumentParser(description="crnerf render server")
    p.add_argument("--ckpt_path", type=str, required=True)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=7060)
    p.add_argument("--N_samples", type=int, default=256)
    p.add_argument("--N_importance", type=int, default=256)
    p.add_argument("--chunk", type=int, default=8192)
    # architecture knobs must match the checkpoint (as in apps/video.py)
    p.add_argument("--netdepth", type=int, default=8)
    p.add_argument("--netwidth", type=int, default=256)
    p.add_argument("--nerf_out_dim", type=int, default=64)
    p.add_argument("--appearance_wh", nargs=2, type=int,
                   default=[224, 160])
    p.add_argument("--warmup", type=str, default="",
                   help="comma list of WxH sizes to pre-compile, "
                        "e.g. 320x240,640x480")
    p.add_argument("--root", type=str, default="",
                   help="sandbox dir: network-supplied paths must "
                        "resolve under it (REQUIRED for non-loopback "
                        "binds; see module docstring trust model)")
    args = p.parse_args(argv)
    if not args.root and args.host not in ("127.0.0.1", "localhost",
                                           "::1"):
        p.error("non-loopback --host requires --root (requests carry "
                "filesystem paths; see trust model in the docstring)")

    from crnerf_tpu.apps.eval import load_variables

    cfg = Config(
        N_samples=args.N_samples, N_importance=args.N_importance,
        chunk=args.chunk, appearance_wh=tuple(args.appearance_wh),
        netdepth=args.netdepth, netwidth=args.netwidth,
        nerf_out_dim=args.nerf_out_dim,
        use_mask=False, encode_random=False,  # serve = demo decode path
    )
    svc = RenderService(cfg, load_variables(args.ckpt_path),
                        root=args.root or None)
    warmup(svc, args.warmup)

    server = Server(svc, args.host, args.port)
    host, port = server.server_address
    print(f"serving on {host}:{port} (ops: ping, encode_style, render, "
          "render_path, stats, shutdown)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return port


if __name__ == "__main__":
    main()
