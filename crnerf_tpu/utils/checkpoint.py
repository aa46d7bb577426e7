"""Checkpoint I/O: one orbax-saved pytree holds the FULL training state.

Reference behavior being matched (SURVEY.md §5.4):
- Lightning ModelCheckpoint(save_last=True) -> we keep ``latest`` plus
  periodic steps (/root/reference/train_mask_grid_sample.py:426-429).
- ``load_ckpt``-style selective, prefix-filtered loading of submodules into a
  fresh model (/root/reference/utils/__init__.py:67-88): params here are a
  nested dict keyed by the same prefixes (nerf_coarse, nerf_fine, enc_a,
  enc_cont, decoder, implicit_mask — SURVEY.md §2.7), so "selective load" is
  dict selection, not string surgery.
- ``save_weights_only.py`` -> ``save_weights_only`` strips params out of a
  full state.

Unlike the reference, the appearance-embedding cache IS checkpointed (it
lives in TrainState — the reference loses its ``embedding_a_list`` on resume,
train…py:89,221).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Iterable, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _rmtree(path: str):
    shutil.rmtree(path, ignore_errors=True)


class CheckpointManager:
    """Thin orbax wrapper: save/restore a TrainState-shaped pytree."""

    _ASIDE_SUFFIX = ".stale"

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._recover_aside_steps()
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def _step_path(self, step: int) -> str:
        return os.path.join(self.directory, str(step))

    @staticmethod
    def _barrier(tag: str):
        """Host-fs mutations (rename/rmtree) run on process 0 only; peers
        wait here so they never observe a half-moved step dir."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(tag)

    def _recover_aside_steps(self):
        """Finish an overwrite interrupted by SIGKILL: a ``<step>.stale``
        dir whose real step is missing is the newest surviving copy —
        rename it back; if the real step exists the overwrite committed,
        so drop the aside copy."""
        if jax.process_index() == 0:
            for name in os.listdir(self.directory):
                if not name.endswith(self._ASIDE_SUFFIX):
                    continue
                aside = os.path.join(self.directory, name)
                real = aside[: -len(self._ASIDE_SUFFIX)]
                if os.path.isdir(real):
                    _rmtree(aside)
                else:
                    os.rename(aside, real)
        self._barrier("crnerf_ckpt_recover")

    def save(self, step: int, state, force: bool = False):
        if force and step in (self.mgr.all_steps() or ()):
            # orbax's force= only bypasses the save-interval policy — it
            # still raises StepAlreadyExistsError for a step directory left
            # by a previous run into the same exp dir. Overwrite semantics
            # (re-training into an existing dir, reference Lightning
            # behavior) need the stale step out of the way first. Rename it
            # ASIDE rather than deleting: a SIGKILL between here and the
            # new save's commit then leaves the aside copy recoverable
            # (__init__ renames it back when the real step is absent)
            # instead of destroying the newest checkpoint.
            stale = self._step_path(step)
            aside = stale + self._ASIDE_SUFFIX
            if jax.process_index() == 0:
                if os.path.isdir(aside):
                    _rmtree(aside)
                if os.path.isdir(stale):
                    os.rename(stale, aside)
            self._barrier("crnerf_ckpt_aside")
            self.mgr.reload()
            saved_ok = False
            try:
                self._save_inner(step, state, force)
                saved_ok = True
            finally:
                if saved_ok and jax.process_index() == 0 and os.path.isdir(
                    aside
                ):
                    _rmtree(aside)
            return
        self._save_inner(step, state, force)

    def _save_inner(self, step: int, state, force: bool):
        self.mgr.save(
            step, args=ocp.args.StandardSave(jax.tree.map(np.asarray, state)),
            force=force,
        )
        self.mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, state_like, step: Optional[int] = None):
        """Restore into the structure of ``state_like`` (shapes/dtypes must
        match). Returns the restored pytree.

        Compat shim: checkpoints written before the flat cache re-layout
        store ``embedding_cache`` as 4-D (N_vocab, hw, hw, C); when the
        template's flat (N_vocab, hw*hw*C) restore fails on that shape, the
        restore is retried with a 4-D template and the row data reshaped
        flat (a pure reshape — bit-identical; see train/state.py)."""
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        target = jax.tree.map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, state_like
        )
        out = self.mgr.restore(step, args=ocp.args.StandardRestore(target))
        template = getattr(state_like, "embedding_cache", None)
        restored = getattr(out, "embedding_cache", None)
        if (
            template is not None
            and restored is not None
            and template.ndim == 2
            and np.ndim(restored) == 4
        ):
            out = out.replace(
                embedding_cache=np.asarray(restored).reshape(template.shape)
            )
        return out

    def close(self):
        self.mgr.close()


def _flatten(tree, prefix, out):
    for k, v in tree.items():
        name = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            _flatten(v, name, out)
        else:
            out[name] = np.asarray(v)


def _unflatten(flat) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for name in flat.files:
        parts = name.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[name]
    return tree


def save_weights_only(state, path: str):
    """Strip a full train state to an inference bundle: params +
    batch_stats in one npz (reference utils/save_weights_only.py:12-15).

    Written tmp+rename so a SIGKILL mid-write (preemption grace expiry)
    can't truncate a previously-good bundle."""
    flat: Dict[str, np.ndarray] = {}
    _flatten(jax.tree.map(np.asarray, state.params), "params", flat)
    bs = getattr(state, "batch_stats", {}) or {}
    _flatten(jax.tree.map(np.asarray, bs), "batch_stats", flat)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def load_weights_only(path: str) -> Dict[str, Any]:
    """Inverse of save_weights_only -> {'params': ..., 'batch_stats': ...}
    variables dict ready for inference."""
    tree = _unflatten(np.load(path))
    tree.setdefault("params", {})
    tree.setdefault("batch_stats", {})
    return tree


def extract_submodule(params: Dict[str, Any], prefix: str):
    """reference extract_model_state_dict (utils/__init__.py:67-82): pull one
    submodule's weights out of a full params tree."""
    if prefix not in params:
        raise KeyError(
            f"submodule {prefix!r} not in checkpoint "
            f"(has {sorted(params)})"
        )
    return params[prefix]


def load_selective(
    params: Dict[str, Any],
    ckpt_params: Dict[str, Any],
    prefixes_to_ignore: Iterable[str] = (),
) -> Dict[str, Any]:
    """reference load_ckpt (utils/__init__.py:84-88): overwrite every
    submodule present in the checkpoint except the ignored prefixes; missing
    submodules keep their fresh init."""
    skip = set(prefixes_to_ignore)
    out = dict(params)
    for k, v in ckpt_params.items():
        if k in skip or k not in params:
            continue
        out[k] = v
    return out
