"""Persistent XLA compilation cache.

Full-step compiles cost 5-10 minutes on the TPU tunnel and ~1-2 minutes
on CPU, and every process pays them again (bench runs, quality runs, the
eval apps, each pytest worker). jax's persistent cache keys serialized
executables by (HLO, platform, version), so re-runs of an unchanged
program load in seconds instead. Correctness-safe by construction; the
reference has no analog (torch eager pays no compile).

Opt out with CRNERF_NO_JIT_CACHE=1 (e.g. when benchmarking compile time
itself). Backends whose executables can't be serialized (some remote
PJRT plugins) silently skip caching — enabling is always safe.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "crnerf_tpu", "jit"
)


def enable(cache_dir: str | None = None) -> bool:
    """Turn on the persistent compilation cache (idempotent). Returns
    whether it was enabled."""
    if os.environ.get("CRNERF_NO_JIT_CACHE"):
        return False
    import jax

    path = cache_dir or os.environ.get(
        "CRNERF_JIT_CACHE_DIR", _DEFAULT_DIR
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # don't bother persisting sub-second compiles
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        # Multi-process runs (CRNERF_MULTIHOST pods): jax only WRITES
        # cache entries from the lead process, so on restarts the lead
        # loads its programs in seconds while every other rank recompiles
        # for minutes. That skew stalls the first collective (CPU/Gloo's
        # communicator setup has a hardcoded 30 s KV timeout — observed
        # as "Gloo context initialization failed: DEADLINE_EXCEEDED" in
        # tests/multiprocess_worker.py before it dropped the cache).
        # Binary sharing makes the lead compile-or-load ONCE and ship the
        # serialized executable to all ranks through the coordination
        # service (blocking get, 20 min default timeout): no skew, and
        # (N-1) fewer compiles per program.
        try:
            from jax._src import distributed

            if distributed.global_state.client is not None:
                jax.config.update("jax_share_binary_between_hosts", True)
        except Exception:
            pass  # private-API drift: plain per-process caching still on
    except Exception:
        return False
    return True
