"""One-time converter: torch `lpips` AlexNet weights -> npz for
crnerf_tpu.eval.lpips. Run on any machine with `pip install lpips torch`:

    python scripts/export_lpips_weights.py --out weights/lpips_alex.npz

(The training/eval image here is offline, so the npz must be produced
elsewhere and copied in.)
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="weights/lpips_alex.npz")
    args = p.parse_args()

    import lpips  # type: ignore
    import torch

    net = lpips.LPIPS(net="alex", spatial=False)
    alex = net.net  # alexnet trunk wrapper with .slice1..slice5
    convs = [
        m for m in net.net.modules()
        if isinstance(m, torch.nn.Conv2d)
    ]
    out = {}
    for i, c in enumerate(convs):
        # torch OIHW -> HWIO
        out[f"conv{i}_w"] = (
            c.weight.detach().numpy().transpose(2, 3, 1, 0)
        )
        out[f"conv{i}_b"] = c.bias.detach().numpy()
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin{i}_w"] = w.reshape(-1)
    import os

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: {sorted(out)}")


if __name__ == "__main__":
    main()
