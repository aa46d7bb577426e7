#!/usr/bin/env python
"""Import a reference CR-NeRF PyTorch-Lightning checkpoint into a
crnerf_tpu inference bundle (weights.npz).

    python scripts/import_torch_ckpt.py --ckpt last.ckpt --out weights.npz

The output is the same npz layout ``utils/checkpoint.save_weights_only``
writes, so the eval/video apps consume it directly:

    python -m crnerf_tpu eval --ckpt_path weights.npz ...

Reference semantics being replaced: per-submodule prefix loading of a
Lightning ckpt (/root/reference/utils/__init__.py:67-88, eval.py:115-121).
The key-based tensor mapping lives in crnerf_tpu/utils/torch_port.py and is
verified bit-exact against the parity suite's module-object ports
(tests/test_import_ckpt.py).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crnerf_tpu.utils.checkpoint import _flatten  # noqa: E402
from crnerf_tpu.utils.torch_port import (  # noqa: E402
    convert_state_dict,
    load_lightning_ckpt,
)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Lightning ckpt -> crnerf_tpu weights.npz"
    )
    p.add_argument("--ckpt", required=True, help=".ckpt / .pth path")
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--netdepth", type=int, default=8)
    p.add_argument(
        "--prefixes_to_ignore", nargs="*", default=["loss"],
        help="state_dict prefixes to drop (reference load_ckpt semantics)",
    )
    args = p.parse_args(argv)

    sd = load_lightning_ckpt(args.ckpt)
    params, stats = convert_state_dict(
        sd, netdepth=args.netdepth,
        prefixes_to_ignore=args.prefixes_to_ignore,
    )
    flat = {}
    _flatten(params, "params", flat)
    _flatten(stats, "batch_stats", flat)
    np.savez(args.out, **flat)
    n = sum(v.size for v in flat.values())
    print(
        f"wrote {args.out}: {len(flat)} arrays, {n:,} parameters "
        f"(submodules: {sorted(params)})"
    )


if __name__ == "__main__":
    main()
