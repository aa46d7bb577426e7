"""Render server (apps/serve.py): protocol, compile-cache reuse, errors.

The serving layer is new capability over the reference (which reloads the
checkpoint per eval/video invocation — eval.py:94-121); these tests drive
the socket-free RenderService core AND a real TCP round-trip on a tiny
random-init model."""

import base64
import json
import os
import threading

import numpy as np
import pytest

import jax

from crnerf_tpu.config import Config
from crnerf_tpu.apps.serve import RenderService, Server, request
from crnerf_tpu.render.inference import bucket_size
from crnerf_tpu.render.system import CrNerfSystem

CFG = dict(
    batch_size=16, N_samples=4, N_importance=4, netdepth=2, netwidth=16,
    nerf_out_dim=8, N_vocab=8, appearance_wh=(32, 24), noise_std=0.0,
    chunk=4096, use_mask=False, encode_random=False,
)
IDENTITY = np.eye(3, 4, dtype=np.float32).tolist()


@pytest.fixture(scope="module")
def service():
    cfg = Config(**CFG)
    variables = CrNerfSystem(cfg).init(jax.random.PRNGKey(0))
    return RenderService(cfg, variables)


@pytest.fixture()
def style_png(tmp_path):
    import imageio.v2 as imageio

    path = str(tmp_path / "style.png")
    rng = np.random.default_rng(0)
    imageio.imwrite(path, rng.integers(0, 255, (24, 32, 3), np.uint8))
    return path


def _render_req(w, h, **extra):
    return {"op": "render", "wh": [w, h], "c2w": IDENTITY,
            "fov": 60.0, **extra}


class TestService:
    def test_ping(self, service):
        r = service.handle({"op": "ping"})
        assert r["ok"] and r["device"] == "cpu" and r["styles"] == []

    def test_encode_render_inline_and_bucket_reuse(self, service,
                                                   style_png):
        r = service.handle({"op": "encode_style", "id": "s1",
                            "image_path": style_png})
        assert r["ok"] and r["styles"] == ["s1"]

        r1 = service.handle(_render_req(24, 18, style_id="s1",
                                        inline=True))
        assert r1["ok"] and r1["compiled"]
        assert r1["bucket"] == bucket_size(24 * 18)
        import imageio.v2 as imageio

        png = base64.b64decode(r1["png_b64"])
        img = imageio.imread(png)
        assert img.shape == (18, 24, 3)

        # a different size in the same quarter-octave bucket must NOT
        # recompile (the point of serving through the bucketed Renderer)
        r2 = service.handle(_render_req(20, 16, style_id="s1",
                                        inline=True))
        assert r2["ok"] and not r2["compiled"]
        assert r2["bucket"] == r1["bucket"]

        stats = service.handle({"op": "stats"})
        assert stats["renders"] >= 2 and stats["p50_ms"] > 0
        assert stats["buckets_compiled"] == [r1["bucket"]]

    def test_warmup_precompiles_and_resets_stats(self, style_png):
        # fresh service (not the shared fixture: warmup must own the
        # compile census and the stats counters)
        from crnerf_tpu.apps.serve import warmup

        cfg = Config(**CFG)
        variables = CrNerfSystem(cfg).init(jax.random.PRNGKey(1))
        svc = RenderService(cfg, variables)
        warmup(svc, "24x18")
        # the warmup render compiled the bucket but must NOT appear in
        # the service's client-visible latency stats
        stats = svc.handle({"op": "stats"})
        assert stats["renders"] == 0 and stats["p50_ms"] is None
        assert stats["buckets_compiled"] == [bucket_size(24 * 18)]
        # first client render in the warmed bucket is NOT a fresh compile
        r = svc.handle({"op": "encode_style", "id": "s",
                        "image_path": style_png})
        assert r["ok"]
        r = svc.handle(_render_req(24, 18, style_id="s", inline=True))
        assert r["ok"] and not r["compiled"]
        stats = svc.handle({"op": "stats"})
        assert stats["renders"] == 1

    def test_render_to_file(self, service, style_png, tmp_path):
        out = str(tmp_path / "frames" / "f.png")
        r = service.handle(_render_req(20, 16, style_image=style_png,
                                       out_path=out))
        assert r["ok"] and os.path.exists(out)

    def test_render_path_preset(self, service, style_png, tmp_path):
        out_dir = str(tmp_path / "path")
        r = service.handle({
            "op": "render_path", "scene": "brandenburg_gate",
            "n_frames": 2, "wh": [20, 16], "style_image": style_png,
            "out_dir": out_dir,
        })
        assert r["ok"] and r["frames"] == 2
        assert os.path.exists(os.path.join(out_dir, "001.png"))
        assert os.path.exists(r["gif"])

    def test_errors_do_not_kill_service(self, service):
        assert not service.handle({"op": "nope"})["ok"]
        assert not service.handle([1, 2])["ok"]
        r = service.handle(_render_req(20, 16, style_id="missing",
                                       inline=True))
        assert not r["ok"] and "unknown style_id" in r["error"]
        r = service.handle(_render_req(20, 16, inline=True))  # no style
        assert not r["ok"] and "style" in r["error"]
        r = service.handle({"op": "render", "wh": [20, 16],
                            "c2w": [[1, 2], [3, 4]], "inline": True})
        assert not r["ok"] and "c2w" in r["error"]
        # a render with neither inline nor out_path is a client error
        bad = {"op": "render", "wh": [20, 16], "c2w": IDENTITY,
               "style_id": "s1"}
        if "s1" in service.styles:
            assert "inline" in service.handle(bad)["error"]
        # the service still works afterwards
        assert service.handle({"op": "ping"})["ok"]


class TestTCP:
    def test_round_trip_and_shutdown(self, service, style_png, tmp_path):
        server = Server(service, "127.0.0.1", 0)
        host, port = server.server_address
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            assert request(host, port, {"op": "ping"})["ok"]
            r = request(host, port, {"op": "encode_style", "id": "tcp",
                                     "image_path": style_png})
            assert r["ok"]
            out = str(tmp_path / "tcp.png")
            r = request(host, port, _render_req(20, 16, style_id="tcp",
                                                out_path=out))
            assert r["ok"] and os.path.exists(out)
            # malformed JSON gets an error reply, not a dropped socket
            import socket as socket_mod

            with socket_mod.create_connection((host, port), 30) as s:
                s.sendall(b"{not json}\n")
                assert b'"ok": false' in s.recv(65536)
            r = request(host, port, {"op": "shutdown"})
            assert r["ok"] and r["shutting_down"]
            t.join(timeout=30)
            assert not t.is_alive()
        finally:
            service._shutdown.clear()
            server.server_close()


    def test_concurrent_clients(self, service, style_png):
        """Two sockets in flight: the ThreadingTCPServer handles each on
        its own thread, renders serialize on the service lock, and every
        client gets a well-formed reply (no interleaved writes)."""
        server = Server(service, "127.0.0.1", 0)
        host, port = server.server_address
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            assert request(host, port, {
                "op": "encode_style", "id": "cc", "image_path": style_png
            })["ok"]
            n_before = service.n_renders
            results = [None] * 4
            errors = []

            def client(i):
                try:
                    results[i] = request(
                        host, port,
                        _render_req(20 + i, 16, style_id="cc",
                                    inline=True),
                    )
                except Exception as e:  # surfaces in the main thread
                    errors.append(e)

            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(4)]
            for th in threads:
                th.start()
            for th in threads:
                th.join(timeout=120)
            assert not errors, errors
            assert all(r and r["ok"] for r in results), results
            assert service.n_renders == n_before + 4
            for r in results:
                img = base64.b64decode(r["png_b64"])
                assert len(img) > 0
        finally:
            server.shutdown()
            server.server_close()


class TestSandbox:
    def test_root_blocks_escapes_and_allows_inside(self, service,
                                                   tmp_path, style_png):
        """--root trust model: network paths must realpath under root;
        symlink escapes refused; in-root writes still work."""
        import shutil

        cfg = Config(**CFG)
        root = tmp_path / "jail"
        root.mkdir()
        shutil.copy(style_png, root / "style.png")
        svc = RenderService(cfg, service.renderer.variables,
                            root=str(root))
        # escape via absolute path
        r = svc.handle({"op": "encode_style", "id": "x",
                        "image_path": "/etc/hostname"})
        assert not r["ok"] and "escapes" in r["error"]
        # escape via symlink inside the root
        link = root / "sneaky.png"
        os.symlink("/etc/hostname", link)
        r = svc.handle({"op": "encode_style", "id": "x",
                        "image_path": str(link)})
        assert not r["ok"] and "escapes" in r["error"]
        # escape on the WRITE side
        r = svc.handle(_render_req(8, 8, style_image=str(root / "style.png"),
                                   out_path=str(tmp_path / "out.png")))
        assert not r["ok"] and "escapes" in r["error"]
        # fully inside the sandbox: works
        r = svc.handle(_render_req(8, 8, style_image=str(root / "style.png"),
                                   out_path=str(root / "ok.png")))
        assert r["ok"] and os.path.exists(root / "ok.png")

    def test_nonloopback_bind_requires_root(self):
        from crnerf_tpu.apps.serve import main as serve_main

        with pytest.raises(SystemExit):
            serve_main(["--ckpt_path", "/nonexistent",
                        "--host", "0.0.0.0"])


def test_client_raises_on_mid_reply_close():
    """request() must surface a ConnectionError (not a JSONDecodeError on
    a truncated buffer) when the peer closes without a newline."""
    import socket as socket_mod

    srv = socket_mod.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    host, port = srv.getsockname()

    def half_reply():
        conn, _ = srv.accept()
        conn.recv(65536)
        conn.sendall(b'{"ok": tr')  # partial, then close
        conn.close()

    t = threading.Thread(target=half_reply, daemon=True)
    t.start()
    with pytest.raises(ConnectionError, match="mid-reply"):
        request(host, port, {"op": "ping"}, timeout=30)
    srv.close()


def test_serve_registered_in_cli():
    from crnerf_tpu.__main__ import COMMANDS

    assert COMMANDS["serve"] == "crnerf_tpu.apps.serve"
