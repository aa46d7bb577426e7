"""Tensor-parallel (auto-SPMD) mode: the 2-D (data, model) mesh train step
must distribute (params actually column-split over the model axis, batch
grids split over the data axis) and match the single-device step numerically
(same math, different collective order -> fp tolerance).

The production distribution path is shard_map DP (test_train.py); this mode
is SURVEY.md §2.9's optional TP stretch, driven purely by jit sharding
annotations (parallel/tp.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from test_train import TINY, _batch, _setup

from crnerf_tpu.config import Config
from crnerf_tpu.parallel.tp import (
    MODEL_AXIS,
    make_mesh_2d,
    shard_train_step_tp,
    tp_state_sharding,
)
from crnerf_tpu.train.step import make_train_step


def _tp_setup(G=4):
    cfg = Config(**TINY).replace(
        perturb=0.0, pallas_train=False, use_pallas=False
    )
    system, tx, sched, state = _setup(cfg)
    step = make_train_step(system, tx, sched, grids_per_step=G)
    parts = [_batch(cfg, seed=s) for s in range(G)]
    for i, p in enumerate(parts):
        p["ts"][:] = i
    batch = {k: np.stack([p[k] for p in parts]) for k in parts[0]}
    return cfg, state, step, batch


class TestTensorParallel:
    def test_2x4_matches_single_device(self):
        G = 4
        cfg, state, step, batch = _tp_setup(G)

        # ---- single-device reference (two steps; keep the 1-step params)
        jref = jax.jit(step)
        s_ref1, m_ref = jref(state, jax.tree.map(jnp.asarray, batch))
        ref1_params = jax.device_get(s_ref1.params)
        s_ref, m_ref2 = jref(s_ref1, jax.tree.map(jnp.asarray, batch))

        # ---- TP over a (data=2, model=4) mesh
        mesh = make_mesh_2d(2, 4)
        jstep, state_sh, batch_sh = shard_train_step_tp(
            step, state, batch, mesh
        )
        st = jax.device_put(state, state_sh)
        bt = jax.device_put(batch, batch_sh)

        # the annotations actually split things
        k1 = st.params["nerf_coarse"]["xyz_encoding_1"]["kernel"]
        # PartitionSpec is a pytree LEAF — inspect it as the tuple it is
        assert MODEL_AXIS in tuple(k1.sharding.spec)
        shard_shape = k1.sharding.shard_shape(k1.shape)
        assert shard_shape[-1] == k1.shape[-1] // 4
        assert bt["rays"].sharding.shard_shape(bt["rays"].shape)[0] == G // 2

        st, m = jstep(st, bt)
        # params after ONE step: grad reductions reorder under SPMD ->
        # ~1e-6 absolute fp noise; near-zero-init biases make pure-relative
        # checks meaningless, and a second adam step (tiny v) amplifies the
        # noise chaotically — so pin step-1 params tight, then let the
        # step-2 LOSS certify the composed trajectory instead
        for a, b in zip(
            jax.tree.leaves(jax.device_get(st.params)),
            jax.tree.leaves(ref1_params),
        ):
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-5)
        st, m2 = jstep(st, bt)

        np.testing.assert_allclose(
            float(m["loss"]), float(m_ref["loss"]), rtol=2e-5
        )
        np.testing.assert_allclose(
            float(m2["loss"]), float(m_ref2["loss"]), rtol=5e-4
        )
        # cache writes land regardless of distribution mode
        assert int(jax.device_get(st.embedding_valid).sum()) == G
        np.testing.assert_array_equal(
            jax.device_get(st.embedding_valid),
            jax.device_get(s_ref.embedding_valid),
        )

    def test_sharding_rule_shapes(self):
        """Non-tensor leaves (rng, step, valid mask, BN stats) stay
        replicated; optimizer moments follow their params."""
        _, state, step, batch = _tp_setup()
        mesh = make_mesh_2d(2, 4)
        sh = tp_state_sharding(state, mesh)
        flat = jax.tree_util.tree_flatten_with_path(sh)[0]
        specs = {
            jax.tree_util.keystr(p): s.spec for p, s in flat
        }
        for k, spec in specs.items():
            if "params" in k or "opt_state" in k:
                continue
            assert not any(tuple(spec)), \
                f"{k} should be replicated, got {spec}"
        # adam moments of a split kernel are split the same way
        split = [
            k for k, s in specs.items()
            if "opt_state" in k and "kernel" in k
            and MODEL_AXIS in tuple(s)
        ]
        assert split, "no optimizer moment picked up the model split"
