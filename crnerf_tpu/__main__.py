"""Single CLI dispatcher: ``python -m crnerf_tpu <cmd> [flags]``.

Commands mirror the reference's five entry points (SURVEY.md §2.6/§7):
prepare | train | eval | metrics | video — plus ``serve``, the resident
render server the reference has no equivalent of (apps/serve.py).
"""

from __future__ import annotations

import sys

COMMANDS = {
    "prepare": "crnerf_tpu.apps.prepare",
    "train": "crnerf_tpu.apps.train",
    "eval": "crnerf_tpu.apps.eval",
    "metrics": "crnerf_tpu.apps.eval_metric",
    "video": "crnerf_tpu.apps.video",
    "serve": "crnerf_tpu.apps.serve",
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in COMMANDS:
        print(
            "usage: python -m crnerf_tpu "
            f"{{{'|'.join(COMMANDS)}}} [flags]\n"
        )
        raise SystemExit(2)
    import importlib

    mod = importlib.import_module(COMMANDS[sys.argv[1]])
    mod.main(sys.argv[2:])


if __name__ == "__main__":
    main()
