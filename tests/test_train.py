"""Training-system tests: losses, schedules, train step (single and
8-device shard_map), embedding cache, checkpoint round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crnerf_tpu.config import Config
from crnerf_tpu.data import make_synthetic_scene, TrainPipeline
from crnerf_tpu.render.system import CrNerfSystem
from crnerf_tpu.train.losses import (
    ExponentialAnnealingWeight,
    crnerf_loss,
)
from crnerf_tpu.train.optim import make_lr_schedule, make_optimizer
from crnerf_tpu.train.state import TrainState
from crnerf_tpu.train.step import make_train_step


TINY = dict(
    batch_size=16, N_samples=4, N_importance=4, netdepth=2, netwidth=16,
    nerf_out_dim=8, N_vocab=8, appearance_wh=(32, 24), noise_std=0.0,
)


def _setup(cfg):
    system = CrNerfSystem(cfg)
    variables = system.init(jax.random.PRNGKey(0))
    tx, sched = make_optimizer(cfg, iters_per_epoch=10)
    state = TrainState.create(
        variables, tx.init(variables["params"]),
        n_vocab=cfg.N_vocab, embed_hw=32, embed_c=cfg.nerf_out_dim,
        rng=jax.random.PRNGKey(1),
    )
    return system, tx, sched, state


def _batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    b = cfg.batch_size
    wa, ha = cfg.appearance_wh
    d = rng.randn(b, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    gh = cfg.grid_hw
    uv = np.stack(np.meshgrid(
        np.linspace(0.1, 0.9, gh), np.linspace(0.1, 0.9, gh),
        indexing="ij"), -1).reshape(-1, 2)
    return {
        "rays": np.concatenate(
            [rng.randn(b, 3), d, np.full((b, 1), 0.5),
             np.full((b, 1), 4.0)], -1
        ).astype(np.float32),
        "ts": np.full((b,), 3, np.int32),
        "rgbs": rng.uniform(0, 1, (b, 3)).astype(np.float32),
        "whole_img": rng.uniform(-1, 1, (1, ha, wa, 3)).astype(np.float32),
        "uv_pix": uv.astype(np.float32),
    }


class TestLosses:
    def test_annealing(self):
        w = ExponentialAnnealingWeight(5e-2, 6e-3, 1e-3)
        assert float(w(0)) == pytest.approx(5e-2)
        assert float(w(10**7)) == pytest.approx(6e-3)
        assert float(w(1000)) == pytest.approx(
            max(6e-3, 5e-2 * np.exp(-1.0)), rel=1e-5
        )

    def test_terms_present(self):
        n = 16
        rng = np.random.RandomState(0)
        results = {
            "a_embedded": jnp.asarray(rng.randn(1, 32, 32, 8)),
            "a_embedded_random": jnp.asarray(rng.randn(1, 32, 32, 8)),
            "a_embedded_random_rec": jnp.asarray(rng.randn(1, 32, 32, 8)),
            "rgb_coarse": jnp.asarray(rng.uniform(0, 1, (n, 3))),
            "rgb_fine": jnp.asarray(rng.uniform(0, 1, (n, 3))),
            "out_mask": jnp.asarray(rng.uniform(0, 1, (n, 1))),
            "content_with_a_embed": jnp.asarray(rng.randn(1, 32, 32, 8)),
            "content_wo_a_embed": jnp.asarray(rng.randn(1, 32, 32, 8)),
        }
        targets = jnp.asarray(rng.uniform(0, 1, (n, 3)))
        d, aw = crnerf_loss(results, targets, 0)
        assert set(d) == {
            "kl_a", "rec_a_random", "c_l", "f_l", "r_ms", "r_md",
            "content_constraint",
        }
        for v in d.values():
            assert np.isfinite(float(v))

    def test_mask_downweights(self):
        n = 8
        rng = np.random.RandomState(0)
        pred = jnp.asarray(rng.uniform(0, 1, (n, 3)))
        gt = jnp.asarray(rng.uniform(0, 1, (n, 3)))
        base = {"rgb_coarse": pred}
        no_mask, _ = crnerf_loss(base, gt, 0)
        full_mask, _ = crnerf_loss(
            {**base, "out_mask": jnp.ones((n, 1))}, gt, 0
        )
        assert float(full_mask["c_l"]) == pytest.approx(0.0, abs=1e-9)
        assert float(no_mask["c_l"]) > 0


class TestSchedules:
    def test_cosine_endpoints(self):
        cfg = Config(lr=1e-3, num_epochs=10, lr_scheduler="cosine")
        s = make_lr_schedule(cfg, iters_per_epoch=100)
        assert float(s(0)) == pytest.approx(1e-3)
        assert float(s(999)) < 1e-4

    def test_steplr(self):
        cfg = Config(lr=1e-3, lr_scheduler="steplr", decay_step=(2, 4),
                     decay_gamma=0.1)
        s = make_lr_schedule(cfg, iters_per_epoch=10)
        assert float(s(0)) == pytest.approx(1e-3)
        assert float(s(25)) == pytest.approx(1e-4)
        assert float(s(45)) == pytest.approx(1e-5)

    def test_warmup(self):
        cfg = Config(lr=1e-3, warmup_epochs=2, warmup_multiplier=2.0,
                     num_epochs=10)
        s = make_lr_schedule(cfg, iters_per_epoch=10)
        assert float(s(0)) == pytest.approx(1e-3)
        assert float(s(20)) == pytest.approx(2e-3, rel=1e-3)


class TestRanger:
    """The `ranger` optimizer must be TRUE torch_optimizer.Ranger
    (reference utils/__init__.py:30-38): gradient centralization + RAdam
    (betas=(0.95, 0.999), N_sma_threshhold=5) + slow-weight
    Lookahead(k=6, alpha=0.5) — not an EMA stand-in. The mirror below is
    an independent transcription of the published algorithms in the torch
    layout (out-dim first; our flax kernels are out-dim LAST, hence the
    transposes)."""

    @staticmethod
    def _ranger_mirror_step(p, g, st, lr, b1=0.95, b2=0.999, eps=1e-8,
                            thresh=5, wd=0.0, k=6, alpha=0.5):
        """One torch-layout Ranger step on a single param. st is a dict
        holding step/exp_avg/exp_avg_sq/slow."""
        import math

        st["step"] += 1
        t = st["step"]
        if g.ndim > 1:  # gradient centralization (dims 1..n)
            g = g - g.mean(axis=tuple(range(1, g.ndim)), keepdims=True)
        st["exp_avg"] = b1 * st["exp_avg"] + (1 - b1) * g
        st["exp_avg_sq"] = b2 * st["exp_avg_sq"] + (1 - b2) * g * g
        b2t = b2 ** t
        n_sma_max = 2 / (1 - b2) - 1
        n_sma = n_sma_max - 2 * t * b2t / (1 - b2t)
        if n_sma > thresh:
            step_size = math.sqrt(
                (1 - b2t) * (n_sma - 4) / (n_sma_max - 4)
                * (n_sma - 2) / n_sma * n_sma_max / (n_sma_max - 2)
            ) / (1 - b1 ** t)
        else:
            step_size = 1.0 / (1 - b1 ** t)
        if wd != 0:
            p = p - wd * lr * p
        if n_sma > thresh:
            denom = np.sqrt(st["exp_avg_sq"]) + eps
            p = p - step_size * lr * st["exp_avg"] / denom
        else:
            p = p - step_size * lr * st["exp_avg"]
        if st["step"] % k == 0:
            st["slow"] = st["slow"] + alpha * (p - st["slow"])
            p = st["slow"].copy()
        return p

    @pytest.mark.parametrize("wd", [0.0, 0.01])
    def test_trajectory_matches_torch_ranger_transcription(self, wd):
        from crnerf_tpu.train.optim import ranger

        lr = 0.01
        rng = np.random.RandomState(0)
        # 'w' is 2-D (GC applies), 'v' is 1-D (GC skipped)
        w0 = rng.randn(5, 3)                          # flax (in, out)
        v0 = rng.randn(4)
        grads = [
            {"w": rng.randn(5, 3), "v": rng.randn(4)} for _ in range(25)
        ]

        # float64 on both sides -> the comparison checks SEMANTICS, not
        # f32 rounding-order noise
        with jax.enable_x64(True):
            tx = ranger(lambda step: lr, weight_decay=wd)
            params = {"w": jnp.asarray(w0), "v": jnp.asarray(v0)}
            opt_state = tx.init(params)
            traj = []
            for g in grads:
                updates, opt_state = tx.update(
                    jax.tree.map(jnp.asarray, g), opt_state, params
                )
                params = jax.tree.map(lambda p, u: p + u, params, updates)
                traj.append(jax.tree.map(np.asarray, params))

        # torch-layout mirror: transpose 'w' so out-dim is first
        def fresh(p):
            return {
                "step": 0,
                "exp_avg": np.zeros_like(p),
                "exp_avg_sq": np.zeros_like(p),
                "slow": p.copy(),
            }

        pw, pv = w0.T.copy(), v0.copy()
        stw, stv = fresh(pw), fresh(pv)
        for i, g in enumerate(grads):
            pw = self._ranger_mirror_step(pw, g["w"].T, stw, lr, wd=wd)
            pv = self._ranger_mirror_step(pv, g["v"], stv, lr, wd=wd)
            np.testing.assert_allclose(
                traj[i]["w"], pw.T, atol=1e-12, rtol=1e-10,
                err_msg=f"step {i + 1} (w)"
            )
            np.testing.assert_allclose(
                traj[i]["v"], pv, atol=1e-12, rtol=1e-10,
                err_msg=f"step {i + 1} (v)"
            )

    def test_lookahead_sync_behavior(self):
        """Between syncs params move freely; at step k the params snap to
        slow + alpha*(fast - slow) with slow starting at init."""
        from crnerf_tpu.train.optim import lookahead

        tx = lookahead(k=3, alpha=0.5)
        p = {"x": jnp.zeros(2)}
        st = tx.init(p)
        fixed = {"x": jnp.ones(2)}  # pretend inner update is +1 each step
        ps = []
        for _ in range(6):
            u, st = tx.update(fixed, st, p)
            p = jax.tree.map(lambda a, b: a + b, p, u)
            ps.append(float(p["x"][0]))
        # steps: 1, 2, sync(0 + .5*(3-0))=1.5, 2.5, 3.5, sync(1.5+.5*3)=3
        assert ps == pytest.approx([1.0, 2.0, 1.5, 2.5, 3.5, 3.0])


class TestTrainStep:
    def test_loss_decreases_and_cache_written(self):
        cfg = Config(**TINY)
        system, tx, sched, state = _setup(cfg)
        step = jax.jit(make_train_step(system, tx, sched))
        b = jax.tree.map(jnp.asarray, _batch(cfg))
        losses = []
        for i in range(8):
            state, m = step(state, b)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert bool(state.embedding_valid[3])
        assert not bool(state.embedding_valid[0])
        assert int(state.step) == 8

    def test_metrics_keys(self):
        cfg = Config(**TINY)
        system, tx, sched, state = _setup(cfg)
        step = jax.jit(make_train_step(system, tx, sched))
        _, m = step(state, jax.tree.map(jnp.asarray, _batch(cfg)))
        for k in ("loss", "psnr", "lr", "annealing_weight"):
            assert k in m
        assert any(k.startswith("loss/") for k in m)

    def test_no_mask_no_appearance_branch(self):
        cfg = Config(**TINY).replace(
            use_mask=False, encode_a=False, encode_random=False
        )
        system, tx, sched, state = _setup(cfg)
        step = jax.jit(make_train_step(system, tx, sched))
        b = _batch(cfg)
        state, m = step(state, jax.tree.map(jnp.asarray, b))
        assert np.isfinite(float(m["loss"]))

    def test_model_mode_141_branch(self):
        """encode_a=False with the '1-4-1' tanh decoder (reference
        get_renderer model_mode, nerf_decoder_stylenerf.py:452-458) —
        the zoo variant trains, not just forwards."""
        cfg = Config(**TINY).replace(
            use_mask=False, encode_a=False, encode_c=False,
            encode_random=False, model_mode="1-4-1",
        )
        system, tx, sched, state = _setup(cfg)
        step = jax.jit(make_train_step(system, tx, sched))
        b = _batch(cfg)
        prev = jax.tree.leaves(state.params)[0].copy()
        state, m = step(state, jax.tree.map(jnp.asarray, b))
        assert np.isfinite(float(m["loss"]))
        assert not np.array_equal(
            np.asarray(jax.device_get(jax.tree.leaves(state.params)[0])),
            np.asarray(prev),
        )


class TestShardedTrainStep:
    def test_eight_device_parity_and_cache_allgather(self):
        from crnerf_tpu.parallel.mesh import (
            DATA_AXIS, make_mesh, put_global_batch, put_replicated,
            shard_train_step,
        )

        cfg = Config(**TINY)
        system, tx, sched, state = _setup(cfg)
        mesh = make_mesh(8)
        state = put_replicated(state, mesh)
        step = shard_train_step(
            make_train_step(system, tx, sched, axis_name=DATA_AXIS),
            mesh, donate_state=False,
        )
        parts = [_batch(cfg, seed=s) for s in range(8)]
        batch = {
            k: np.stack([p[k] for p in parts]) for k in parts[0]
        }
        for d in range(8):
            batch["ts"][d, :] = d  # distinct image per device
        batch = put_global_batch(batch, mesh)
        state, m = step(state, batch)
        assert np.isfinite(float(m["loss"]))
        # every device's cache write must land on all replicas
        assert int(jax.device_get(state.embedding_valid).sum()) == 8

    def test_replicas_stay_identical(self):
        from crnerf_tpu.parallel.mesh import (
            DATA_AXIS, make_mesh, put_global_batch, put_replicated,
            shard_train_step,
        )

        cfg = Config(**TINY)
        system, tx, sched, state = _setup(cfg)
        mesh = make_mesh(4)
        state = put_replicated(state, mesh)
        step = shard_train_step(
            make_train_step(system, tx, sched, axis_name=DATA_AXIS),
            mesh, donate_state=False,
        )
        parts = [_batch(cfg, seed=s) for s in range(4)]
        batch = put_global_batch(
            {k: np.stack([p[k] for p in parts]) for k in parts[0]}, mesh
        )
        for _ in range(2):
            state, _ = step(state, batch)
        # params are replicated: gathering shards must agree
        leaf = jax.tree.leaves(state.params)[0]
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)


class TestDevicesTimesGrids:
    def test_8dev_g2_matches_16grid_single_device(self):
        """The flagship multi-chip layout (D=8 devices x G=2 grids/device)
        must be numerically the reference's 16-rank DDP semantics, i.e.
        identical to the single-device G=16 run: pmean-over-D of
        mean-over-G == mean-over-16 for grads/BN stats, and all 16
        embedding-cache writes land on every replica
        (train_mask_grid_sample.py:445-447 semantics)."""
        from crnerf_tpu.parallel.mesh import (
            DATA_AXIS, make_mesh, put_global_batch, put_replicated,
            shard_train_step,
        )

        cfg = Config(**TINY).replace(perturb=0.0)
        system, tx, sched, state = _setup(cfg)
        D, G = 8, 2
        parts = [_batch(cfg, seed=s) for s in range(D * G)]
        for i, p in enumerate(parts):
            p["ts"][:] = i % cfg.N_vocab
        flat = {k: np.stack([p[k] for p in parts]) for k in parts[0]}

        # single-device, G=16
        step16 = jax.jit(
            make_train_step(system, tx, sched, grids_per_step=D * G)
        )
        s16, m16 = step16(state, jax.tree.map(jnp.asarray, flat))

        # 8-device shard_map, G=2: device d consumes grids [G*d, G*d+1]
        # (the TrainPipeline.epoch_batches (D, G, B, ...) reshape order)
        mesh = make_mesh(D)
        sdg = put_replicated(jax.device_get(state), mesh)
        stepDG = shard_train_step(
            make_train_step(
                system, tx, sched, axis_name=DATA_AXIS, grids_per_step=G
            ),
            mesh, donate_state=False,
        )
        batch = {
            k: v.reshape(D, G, *v.shape[1:]) for k, v in flat.items()
        }
        sDG, mDG = stepDG(sdg, put_global_batch(batch, mesh))

        assert float(mDG["loss"]) == pytest.approx(
            float(m16["loss"]), rel=1e-5
        )
        # updated params identical (DDP grad-equivalence)
        for a, b in zip(
            jax.tree.leaves(jax.device_get(s16.params)),
            jax.tree.leaves(jax.device_get(sDG.params)),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
            )
        # BN running stats identical
        for a, b in zip(
            jax.tree.leaves(jax.device_get(s16.batch_stats)),
            jax.tree.leaves(jax.device_get(sDG.batch_stats)),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
            )
        # all D*G cache writes land, identically to the single-device run
        va = np.asarray(jax.device_get(s16.embedding_valid))
        vb = np.asarray(jax.device_get(sDG.embedding_valid))
        assert int(vb.sum()) == min(D * G, cfg.N_vocab)
        np.testing.assert_array_equal(va, vb)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(s16.embedding_cache)),
            np.asarray(jax.device_get(sDG.embedding_cache)),
            rtol=1e-3, atol=1e-5,
        )


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from crnerf_tpu.utils.checkpoint import (
            CheckpointManager, load_weights_only, save_weights_only,
        )

        cfg = Config(**TINY)
        system, tx, sched, state = _setup(cfg)
        step = jax.jit(make_train_step(system, tx, sched))
        state, _ = step(state, jax.tree.map(jnp.asarray, _batch(cfg)))

        mgr = CheckpointManager(str(tmp_path / "ck"))
        host = jax.device_get(state)
        mgr.save(1, host)
        assert mgr.latest_step() == 1
        restored = mgr.restore(host)
        np.testing.assert_array_equal(
            np.asarray(restored.step), np.asarray(host.step)
        )
        a = jax.tree.leaves(host.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # embedding cache checkpointed (the reference loses it)
        np.testing.assert_array_equal(
            np.asarray(restored.embedding_valid),
            np.asarray(host.embedding_valid),
        )
        mgr.close()

        p = str(tmp_path / "weights.npz")
        save_weights_only(host, p)
        v = load_weights_only(p)
        assert "nerf_coarse" in v["params"]
        np.testing.assert_array_equal(
            v["params"]["nerf_coarse"]["sigma"]["kernel"],
            np.asarray(host.params["nerf_coarse"]["sigma"]["kernel"]),
        )

    def test_restore_legacy_4d_cache(self, tmp_path):
        """Checkpoints written before the flat cache re-layout hold a 4-D
        (N_vocab, hw, hw, C) embedding_cache; restore must reshape them
        into the flat template (utils/checkpoint.py compat shim)."""
        from crnerf_tpu.utils.checkpoint import CheckpointManager

        cfg = Config(**TINY)
        system, tx, sched, state = _setup(cfg)
        host = jax.device_get(state)
        n_vocab = host.embedding_cache.shape[0]
        hw, c = host.embed_hw, host.embed_c
        cache = np.arange(
            n_vocab * hw * hw * c, dtype=np.float32
        ).reshape(n_vocab, hw * hw * c)
        legacy = host.replace(
            embedding_cache=cache.reshape(n_vocab, hw, hw, c)
        )
        mgr = CheckpointManager(str(tmp_path / "ck_legacy"))
        mgr.save(1, legacy)
        restored = mgr.restore(host)  # flat template
        assert restored.embedding_cache.shape == (n_vocab, hw * hw * c)
        np.testing.assert_array_equal(
            np.asarray(restored.embedding_cache), cache
        )
        mgr.close()

    def test_force_overwrites_existing_step_across_managers(self, tmp_path):
        """Re-training into an existing exp dir must OVERWRITE the same
        global step, not crash: orbax's force= alone still raises
        StepAlreadyExistsError for a step directory left by a previous
        process (this bit the CLI drive; utils/checkpoint.py deletes the
        stale step first)."""
        from crnerf_tpu.utils.checkpoint import CheckpointManager

        cfg = Config(**TINY)
        system, tx, sched, state = _setup(cfg)
        host = jax.device_get(state)
        path = str(tmp_path / "ck_again")

        mgr = CheckpointManager(path)
        mgr.save(7, host)
        mgr.close()

        # fresh manager over the same directory = the re-run scenario
        mgr2 = CheckpointManager(path)
        newer = host.replace(step=np.asarray(123, np.int32))
        mgr2.save(7, newer, force=True)
        restored = mgr2.restore(host, step=7)
        assert int(np.asarray(restored.step)) == 123
        mgr2.close()

    def test_aside_recovery_after_interrupted_overwrite(self, tmp_path):
        """The overwrite path renames the stale step ASIDE before the new
        save (utils/checkpoint.py): a SIGKILL between the two must not
        destroy the newest checkpoint — a fresh manager finds the
        ``<step>.stale`` dir with no real step and renames it back."""
        import os

        from crnerf_tpu.utils.checkpoint import CheckpointManager

        cfg = Config(**TINY)
        system, tx, sched, state = _setup(cfg)
        host = jax.device_get(state)
        path = str(tmp_path / "ck_aside")

        mgr = CheckpointManager(path)
        mgr.save(7, host.replace(step=np.asarray(77, np.int32)))
        mgr.close()

        # simulate the kill window: stale step moved aside, new save
        # never committed
        os.rename(os.path.join(path, "7"), os.path.join(path, "7.stale"))

        mgr2 = CheckpointManager(path)  # recovery runs in __init__
        assert mgr2.latest_step() == 7
        restored = mgr2.restore(host, step=7)
        assert int(np.asarray(restored.step)) == 77
        mgr2.close()

        # the committed-overwrite case: both real and aside present ->
        # the aside copy is dropped, the real one wins
        mgr3 = CheckpointManager(path)
        mgr3.save(7, host.replace(step=np.asarray(88, np.int32)),
                  force=True)
        mgr3.close()
        os.makedirs(os.path.join(path, "7.stale"))
        mgr4 = CheckpointManager(path)
        assert not os.path.exists(os.path.join(path, "7.stale"))
        assert int(np.asarray(mgr4.restore(host, step=7).step)) == 88
        mgr4.close()

    def test_load_selective(self):
        from crnerf_tpu.utils.checkpoint import load_selective

        fresh = {"nerf_coarse": {"w": np.zeros(2)}, "decoder": {"w": np.zeros(2)}}
        ckpt = {"nerf_coarse": {"w": np.ones(2)}, "loss": {"w": np.ones(2)}}
        out = load_selective(fresh, ckpt, prefixes_to_ignore=("loss",))
        np.testing.assert_array_equal(out["nerf_coarse"]["w"], np.ones(2))
        np.testing.assert_array_equal(out["decoder"]["w"], np.zeros(2))


class TestGridsPerStep:
    def test_multigrid_step_runs_and_writes_cache(self):
        cfg = Config(**TINY)
        system, tx, sched, state = _setup(cfg)
        G = 3
        step = jax.jit(make_train_step(system, tx, sched, grids_per_step=G))
        parts = [_batch(cfg, seed=s) for s in range(G)]
        batch = {k: np.stack([p[k] for p in parts]) for k in parts[0]}
        for g in range(G):
            batch["ts"][g, :] = g + 1  # distinct image per grid
        state, m = step(state, jax.tree.map(jnp.asarray, batch))
        assert np.isfinite(float(m["loss"]))
        # all G appearance embeddings cached
        assert int(np.asarray(state.embedding_valid).sum()) == G

    def test_multigrid_matches_mean_of_singles_at_init(self):
        """One multigrid loss == mean of single-grid losses (same params,
        no appearance-random branch to decorrelate)."""
        cfg = Config(**TINY).replace(encode_random=False, use_mask=False,
                                     perturb=0.0)
        system, tx, sched, state = _setup(cfg)
        G = 2
        parts = [_batch(cfg, seed=s) for s in range(G)]
        singles = []
        step1 = jax.jit(make_train_step(system, tx, sched))
        for p in parts:
            _, m = step1(state, jax.tree.map(jnp.asarray, p))
            singles.append(float(m["loss"]))
        stepG = jax.jit(make_train_step(system, tx, sched, grids_per_step=G))
        batch = {k: np.stack([p[k] for p in parts]) for k in parts[0]}
        _, mg = stepG(state, jax.tree.map(jnp.asarray, batch))
        # same RNG stream differs per path; with perturb=0, noise_std=0 the
        # forward is deterministic -> exact mean
        assert float(mg["loss"]) == pytest.approx(
            float(np.mean(singles)), rel=1e-5
        )

    def test_fold_heads_matches_vmapped_heads(self):
        """fold_heads (enc_a on the grids folded into one 4-D batch) ==
        per-grid vmapped enc_a: loss, params, cache. The fold is a pure
        conv-batching change (no cross-sample coupling in enc_a).
        Default is OFF after the TPU A/B rejection (BASELINE.md
        2026-08-19: folded bwd -10..-13%); the knob and its exact-math
        guarantee are kept."""
        from crnerf_tpu.render.system import CrNerfSystem

        cfg = Config(**TINY).replace(perturb=0.0, fold_heads=True)
        system, tx, sched, state = _setup(cfg)
        G = 3
        parts = [_batch(cfg, seed=s) for s in range(G)]
        for g in range(G):
            parts[g]["ts"][:] = g
        jb = jax.tree.map(
            jnp.asarray,
            {k: np.stack([p[k] for p in parts]) for k in parts[0]},
        )
        step_f = jax.jit(make_train_step(system, tx, sched,
                                         grids_per_step=G))
        system_u = CrNerfSystem(cfg.replace(fold_heads=False))
        step_u = jax.jit(make_train_step(system_u, tx, sched,
                                         grids_per_step=G))
        s_f, m_f = step_f(state, jb)
        s_u, m_u = step_u(state, jb)
        assert float(m_f["loss"]) == pytest.approx(
            float(m_u["loss"]), rel=1e-5
        )
        for a, b in zip(
            jax.tree.leaves(jax.device_get(s_f.params)),
            jax.tree.leaves(jax.device_get(s_u.params)),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
            )
        np.testing.assert_allclose(
            np.asarray(jax.device_get(s_f.embedding_cache)),
            np.asarray(jax.device_get(s_u.embedding_cache)),
            rtol=1e-4, atol=1e-6,
        )

    def test_hoist_and_fold_hoist_match_inscan(self):
        """hoist_heads (enc_a/CGNet outside the chunk scan, grads via
        vjp cotangents) and the fold+hoist combination (enc_a traced
        non-vmapped on the folded 4-D batch inside the hoisted vjp —
        the variant the two single-knob TPU rejections never measured)
        == the in-scan chunked step: loss, params, cache."""
        cfg = Config(**TINY).replace(perturb=0.0)
        system, tx, sched, state = _setup(cfg)
        G = 4
        parts = [_batch(cfg, seed=s) for s in range(G)]
        for g in range(G):
            parts[g]["ts"][:] = g
        jb = jax.tree.map(
            jnp.asarray,
            {k: np.stack([p[k] for p in parts]) for k in parts[0]},
        )
        step_ref = jax.jit(make_train_step(system, tx, sched,
                                           grids_per_step=G,
                                           grad_accum_chunks=2))
        s_ref, m_ref = step_ref(state, jb)
        for variant in (dict(hoist_heads=True),
                        dict(hoist_heads=True, fold_heads=True)):
            sys_v = CrNerfSystem(cfg.replace(**variant))
            step_v = jax.jit(make_train_step(sys_v, tx, sched,
                                             grids_per_step=G,
                                             grad_accum_chunks=2))
            s_v, m_v = step_v(state, jb)
            assert float(m_v["loss"]) == pytest.approx(
                float(m_ref["loss"]), rel=1e-5
            ), variant
            for a, b in zip(
                jax.tree.leaves(jax.device_get(s_ref.params)),
                jax.tree.leaves(jax.device_get(s_v.params)),
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
                )
            np.testing.assert_allclose(
                np.asarray(jax.device_get(s_ref.embedding_cache)),
                np.asarray(jax.device_get(s_v.embedding_cache)),
                rtol=1e-4, atol=1e-6,
            )

    def test_grad_accum_chunks_match_vmapped(self):
        """C-chunked gradient accumulation == the vmapped G step (fp
        order aside): params, cache, BN stats, metrics."""
        cfg = Config(**TINY).replace(perturb=0.0)
        system, tx, sched, state = _setup(cfg)
        G = 4
        parts = [_batch(cfg, seed=s) for s in range(G)]
        for g in range(G):
            parts[g]["ts"][:] = g
        batch = {k: np.stack([p[k] for p in parts]) for k in parts[0]}
        jb = jax.tree.map(jnp.asarray, batch)

        step1 = jax.jit(make_train_step(system, tx, sched,
                                        grids_per_step=G))
        s_a, m_a = step1(state, jb)
        step2 = jax.jit(make_train_step(system, tx, sched,
                                        grids_per_step=G,
                                        grad_accum_chunks=2))
        s_b, m_b = step2(state, jb)

        assert float(m_b["loss"]) == pytest.approx(
            float(m_a["loss"]), rel=1e-5
        )
        for a, b in zip(
            jax.tree.leaves(jax.device_get(s_a.params)),
            jax.tree.leaves(jax.device_get(s_b.params)),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
            )
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(s_a.embedding_valid)),
            np.asarray(jax.device_get(s_b.embedding_valid)),
        )
        np.testing.assert_allclose(
            np.asarray(jax.device_get(s_a.embedding_cache)),
            np.asarray(jax.device_get(s_b.embedding_cache)),
            rtol=1e-3, atol=1e-5,
        )
        for a, b in zip(
            jax.tree.leaves(jax.device_get(s_a.batch_stats)),
            jax.tree.leaves(jax.device_get(s_b.batch_stats)),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
            )

        # unrolled chunk scan: same scan semantics — equal to the rolled
        # scan up to XLA fusion-order fp noise (measured 6e-7 max abs)
        step3 = jax.jit(make_train_step(system, tx, sched,
                                        grids_per_step=G,
                                        grad_accum_chunks=2,
                                        chunk_unroll=True))
        s_c, m_c = step3(state, jb)
        assert float(m_c["loss"]) == pytest.approx(
            float(m_b["loss"]), rel=1e-5
        )
        for a, b in zip(
            jax.tree.leaves(jax.device_get(s_b.params)),
            jax.tree.leaves(jax.device_get(s_c.params)),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
            )


class TestPallasTrainRoute:
    def test_pallas_train_step_matches_flax(self):
        """The exact TPU training route (fused Pallas fwd + weight-grad
        bwd, via the interpreter on CPU) produces the same loss and
        near-identical parameter updates as the flax path."""
        cfg = Config(**TINY).replace(
            netdepth=4, perturb=0.0, use_mask=False,
            encode_random=False,
        )
        b = jax.tree.map(jnp.asarray, _batch(cfg))

        def one_step(pallas):
            c = cfg.replace(pallas_train=pallas, pallas_interpret=pallas)
            system, tx, sched, state = _setup(c)
            step = jax.jit(make_train_step(system, tx, sched))
            new_state, m = step(state, b)
            return new_state, float(m["loss"])

        s_flax, l_flax = one_step(False)
        s_pal, l_pal = one_step(True)
        assert l_pal == pytest.approx(l_flax, rel=1e-5)
        for a, c in zip(jax.tree.leaves(s_flax.params),
                        jax.tree.leaves(s_pal.params)):
            np.testing.assert_allclose(
                np.asarray(c), np.asarray(a), atol=5e-5
            )


class TestShardMapPallasFused:
    """The flagship production layout — DP shard_map x fused Pallas
    kernels with the stash backward — must execute and match the
    single-device fused run (round-2 verdict weak #3: every multi-device
    test ran the XLA route while the TPU bench ran Pallas without
    shard_map; this closes the gap via interpret mode on the CPU mesh).
    Reference semantics: train_mask_grid_sample.py:445-447 (DDP)."""

    def _fused_cfg(self):
        return Config(**TINY).replace(
            netdepth=4, perturb=0.0,
            pallas_train=True, pallas_interpret=True, pallas_stash=True,
        )

    def test_8dev_fused_stash_matches_single_device(self):
        from crnerf_tpu.parallel.mesh import (
            DATA_AXIS, make_mesh, put_global_batch, put_replicated,
            shard_train_step,
        )

        cfg = self._fused_cfg()
        system, tx, sched, state = _setup(cfg)
        D = 8
        parts = [_batch(cfg, seed=s) for s in range(D)]
        for i, p in enumerate(parts):
            p["ts"][:] = i % cfg.N_vocab
        flat = {k: np.stack([p[k] for p in parts]) for k in parts[0]}

        # single-device fused reference: G=8 vmapped grids
        step8 = jax.jit(
            make_train_step(system, tx, sched, grids_per_step=D)
        )
        s8, m8 = step8(state, jax.tree.map(jnp.asarray, flat))

        # 8-device shard_map, one grid per device, same fused route
        mesh = make_mesh(D)
        sd = put_replicated(jax.device_get(state), mesh)
        stepD = shard_train_step(
            make_train_step(system, tx, sched, axis_name=DATA_AXIS),
            mesh, donate_state=False,
        )
        sD, mD = stepD(sd, put_global_batch(flat, mesh))

        assert float(mD["loss"]) == pytest.approx(
            float(m8["loss"]), rel=1e-5
        )
        for a, b in zip(
            jax.tree.leaves(jax.device_get(s8.params)),
            jax.tree.leaves(jax.device_get(sD.params)),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
            )
        # all D cache writes land on every replica
        assert int(jax.device_get(sD.embedding_valid).sum()) == D

    def test_4dev_g2_chunked_fused_stash(self):
        """Full production topology: D devices x G grids x C grad-accum
        chunks, fused fwd + stash bwd — the exact TPU pod configuration
        (G=16/C=2 at scale), on the CPU mesh via interpret mode."""
        from crnerf_tpu.parallel.mesh import (
            DATA_AXIS, make_mesh, put_global_batch, put_replicated,
            shard_train_step,
        )

        cfg = self._fused_cfg()
        system, tx, sched, state = _setup(cfg)
        D, G = 4, 2
        parts = [_batch(cfg, seed=s) for s in range(D * G)]
        for i, p in enumerate(parts):
            p["ts"][:] = i % cfg.N_vocab
        flat = {k: np.stack([p[k] for p in parts]) for k in parts[0]}

        step8 = jax.jit(
            make_train_step(system, tx, sched, grids_per_step=D * G)
        )
        s8, m8 = step8(state, jax.tree.map(jnp.asarray, flat))

        mesh = make_mesh(D)
        sd = put_replicated(jax.device_get(state), mesh)
        stepDGC = shard_train_step(
            make_train_step(
                system, tx, sched, axis_name=DATA_AXIS,
                grids_per_step=G, grad_accum_chunks=2,
            ),
            mesh, donate_state=False,
        )
        batch = {k: v.reshape(D, G, *v.shape[1:]) for k, v in flat.items()}
        sD, mD = stepDGC(sd, put_global_batch(batch, mesh))

        assert float(mD["loss"]) == pytest.approx(
            float(m8["loss"]), rel=1e-5
        )
        for a, b in zip(
            jax.tree.leaves(jax.device_get(s8.params)),
            jax.tree.leaves(jax.device_get(sD.params)),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
            )
        assert int(jax.device_get(sD.embedding_valid).sum()) == min(
            D * G, cfg.N_vocab
        )


class TestEncodeContentPath:
    def test_content_constraint_flows(self):
        """--encode_c: content encoder + content_constraint loss term (the
        reference's eval-time encode_c path crashes — SURVEY.md §2.8; ours
        must not)."""
        cfg = Config(**TINY).replace(encode_c=True)
        system, tx, sched, state = _setup(cfg)
        step = jax.jit(make_train_step(system, tx, sched))
        state, m = step(state, jax.tree.map(jnp.asarray, _batch(cfg)))
        assert "loss/content_constraint" in m
        assert np.isfinite(float(m["loss/content_constraint"]))
        assert "enc_cont" in state.params


class TestPallasInferenceRoute:
    def test_fused_eval_forward_matches_flax(self):
        """Eval-time system.forward through the fused kernel (interpreter)
        == the XLA path."""
        cfg = Config(**TINY).replace(netdepth=4, use_mask=False,
                                     encode_random=False)
        system, tx, sched, state = _setup(cfg)
        b = jax.tree.map(jnp.asarray, _batch(cfg))
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}

        def fwd(c):
            sys2 = CrNerfSystem(c)
            out, _ = sys2.forward(
                variables, b, jax.random.PRNGKey(0), train=False
            )
            return out

        ref = fwd(cfg)
        fused = fwd(cfg.replace(use_pallas=True, pallas_interpret=True))
        np.testing.assert_allclose(
            np.asarray(fused["rgb_fine"]), np.asarray(ref["rgb_fine"]),
            atol=2e-5,
        )
        # the inference tile target (eval_tile_pts, default 2048 after
        # the 2026-08-19 eval A/B) is pure scheduling: any value == the
        # kernel's train default (0 -> 4096-pt tiles)
        for pts in (0, 512):
            tiled = fwd(cfg.replace(use_pallas=True, pallas_interpret=True,
                                    eval_tile_pts=pts))
            np.testing.assert_allclose(
                np.asarray(tiled["rgb_fine"]),
                np.asarray(fused["rgb_fine"]), atol=2e-5,
            )


class TestShardedEvalRender:
    def test_sharded_full_image_matches_single_device(self):
        """shard_render over the 8-device mesh == single-device forward
        (rays sharded, features all-gathered, decode replicated)."""
        from crnerf_tpu.parallel.mesh import make_mesh, shard_render

        cfg = Config(**TINY)
        system = CrNerfSystem(cfg)
        variables = system.init(jax.random.PRNGKey(0))

        h, w = 6, 15  # 90 pixels: NOT a multiple of 8 -> exercises padding
        n = h * w
        o = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
        d = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.concatenate(
            [o, d, jnp.full((n, 1), 0.5), jnp.full((n, 1), 4.0)], -1
        )
        wa, ha = cfg.appearance_wh
        whole = jax.random.uniform(
            jax.random.PRNGKey(3), (1, ha, wa, 3)
        ) * 2 - 1

        batch = {"rays": rays, "whole_img": whole}
        ref, _ = system.forward(
            variables, batch, jax.random.PRNGKey(0), train=False,
            image_hw=(h, w),
        )

        fn = shard_render(system, make_mesh(8), (h, w))
        got = fn(variables, rays, whole, jax.random.PRNGKey(0))

        for k in ("rgb_fine", "rgb_coarse", "out_mask"):
            assert k in got, k
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(ref[k]), atol=1e-5,
                err_msg=k,
            )
        # fine depth passes through sample_pdf's DISCRETE bin selection:
        # f32 accumulation differs slightly with the per-device batch
        # split, and a flipped searchsorted bin moves z_fine a bin width
        # on boundary rays — inherent, image outputs above are tight
        np.testing.assert_allclose(
            np.asarray(got["depth_fine"]), np.asarray(ref["depth_fine"]),
            atol=0.05, err_msg="depth_fine",
        )
