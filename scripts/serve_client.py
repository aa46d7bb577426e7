"""Minimal CLI client for the crnerf render server (apps/serve.py).

One request per invocation; the JSON is given inline or built from flags.

  python scripts/serve_client.py --port 7060 '{"op": "ping"}'
  python scripts/serve_client.py --port 7060 --render --wh 320 240 \
      --style_image artworks/starry.jpg --out frame.png
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from crnerf_tpu.apps.serve import request


def main(argv=None):
    p = argparse.ArgumentParser(description="crnerf serve client")
    p.add_argument("json", nargs="?", help="raw JSON request")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7060)
    p.add_argument("--render", action="store_true",
                   help="build a render request from the flags below")
    p.add_argument("--wh", nargs=2, type=int, default=[320, 240])
    p.add_argument("--fov", type=float, default=60.0)
    p.add_argument("--c2w", type=float, nargs=12, default=None,
                   help="row-major 3x4 pose (default: identity)")
    p.add_argument("--style_id", default=None)
    p.add_argument("--style_image", default=None)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    if args.render:
        c2w = (
            np.asarray(args.c2w, np.float32).reshape(3, 4)
            if args.c2w else np.eye(3, 4, dtype=np.float32)
        )
        req = {"op": "render", "wh": args.wh, "fov": args.fov,
               "c2w": c2w.tolist()}
        if args.style_id:
            req["style_id"] = args.style_id
        if args.style_image:
            req["style_image"] = args.style_image
        if args.out:
            req["out_path"] = args.out
        else:
            req["inline"] = True
    elif args.json:
        req = json.loads(args.json)
    else:
        p.error("pass a JSON request or --render")

    resp = request(args.host, args.port, req)
    if "png_b64" in resp:
        resp["png_b64"] = f"<{len(resp['png_b64'])} b64 chars>"
    json.dump(resp, sys.stdout, indent=2)
    print()
    return 0 if resp.get("ok") else 1


if __name__ == "__main__":
    raise SystemExit(main())
