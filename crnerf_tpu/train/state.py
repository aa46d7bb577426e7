"""Train state: ONE pytree holding everything that evolves during training.

This is the TPU-native answer to the reference's scattered mutable state
(SURVEY.md §5.2/§5.4): Lightning module attributes, the per-rank
``embedding_a_list`` Python list (train…py:89,221 — lost on resume, never
checkpointed), and the ``global_val.current_epoch`` module global. Here:
params, optimizer state, CGNet batch stats, the appearance-embedding cache
(as a dense FLAT (N_vocab, hw*hw*C) array + validity mask — checkpointed,
DP-replicated), the PRNG key, and the step counter all live in one orbax-
checkpointable pytree.

Checkpoint compat: checkpoints written before 2026-08-17 stored the cache
as 4-D (N_vocab, hw, hw, C); ``utils/checkpoint.py`` reshapes such rows on
restore (the flat re-layout is a pure reshape, bit-identical data).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array                 # ()
    params: Dict[str, Any]
    batch_stats: Dict[str, Any]
    opt_state: Any
    # cache rows are FLAT (N_vocab, hw*hw*C): row scatter (write-back) and
    # row gather (random-style selection) then agree on one trivial {1,0}
    # layout — the 4-D form made XLA relayout-copy the whole 393 MB buffer
    # twice per step between the scatter's and the donation's layouts
    embedding_cache: jax.Array      # (N_vocab, hw*hw*C)
    embedding_valid: jax.Array      # (N_vocab,) bool
    rng: jax.Array                  # PRNG key
    embed_hw: int = struct.field(pytree_node=False, default=32)
    embed_c: int = struct.field(pytree_node=False, default=64)

    @classmethod
    def create(cls, variables, opt_state, n_vocab: int, embed_hw: int,
               embed_c: int, rng, cache_dtype=jnp.float32):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=opt_state,
            embedding_cache=jnp.zeros(
                (n_vocab, embed_hw * embed_hw * embed_c), cache_dtype
            ),
            embedding_valid=jnp.zeros((n_vocab,), bool),
            rng=rng,
            embed_hw=embed_hw,
            embed_c=embed_c,
        )
