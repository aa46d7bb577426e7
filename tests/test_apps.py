"""App-layer tests: config CLI, camera paths, metric protocol, logging,
visualization, the CLI dispatcher."""

import json
import os

import numpy as np
import pytest

from crnerf_tpu.config import Config, get_config


class TestConfig:
    def test_resolved_chunks_auto(self):
        """AUTO grad-accum chunking: <=8 grids' stash live per chunk;
        a G with no divisor near ceil(G/8) must fall back to an
        HBM-SAFE divisor (serialized), never to 1 (all stash live)."""
        base = dict(pallas_stash=True, grad_accum_chunks=0)
        assert Config(grids_per_step=16, **base).resolved_chunks() == 2
        assert Config(grids_per_step=24, **base).resolved_chunks() == 3
        assert Config(grids_per_step=4, **base).resolved_chunks() == 1
        # prime G: only divisors are 1 and G -> warn + pick G (safe),
        # NOT 1 (17 grids' stash live would exceed HBM at full width)
        with pytest.warns(UserWarning, match="no divisor"):
            assert Config(grids_per_step=17, **base).resolved_chunks() == 17
        with pytest.warns(UserWarning, match="no divisor"):
            assert Config(grids_per_step=13, **base).resolved_chunks() == 13
        # explicit always wins
        assert Config(
            grids_per_step=16, pallas_stash=True, grad_accum_chunks=5
        ).resolved_chunks() == 5

    def test_defaults_match_reference(self):
        cfg = Config()
        # reference opt.py defaults (SURVEY.md §2.1)
        assert cfg.N_emb_xyz == 15 and cfg.N_emb_dir == 4
        assert cfg.N_samples == 64 and cfg.N_importance == 64
        assert cfg.nerf_out_dim == 64 and cfg.N_a == 48
        assert cfg.batch_size == 1024 and cfg.lr == 5e-4
        assert cfg.encode_a and cfg.use_mask and cfg.encode_random
        assert cfg.in_channels_xyz == 93 and cfg.in_channels_dir == 27
        assert cfg.grid_hw == 32

    def test_perf_routing_defaults_are_the_measured_optimum(self):
        """Pin the perf-routing defaults to the configuration BASELINE.md
        measured fastest on TPU (166-170k rays/s at HEAD), so a future
        knob flip must come with a fresh A/B, not by accident. Each
        default below has a measured rejection of its alternative
        recorded in BASELINE.md (2026-08-17..19)."""
        cfg = Config()
        assert cfg.use_pallas and cfg.pallas_train and cfg.pallas_render
        assert cfg.pallas_stash  # +25-30% over full recompute
        assert cfg.pdf_impl == "onehot"  # maskreduce measured -1.4%
        assert cfg.fast_sincos and cfg.eval_bucket
        assert not cfg.hoist_heads   # measured -2.8% (vjp serializes)
        assert not cfg.s2d_heads     # measured -3.7% (repack traffic)
        assert not cfg.s2d_stack     # measured neutral, adds complexity
        assert not cfg.fold_heads    # measured -10..-13% (folded bwd)
        assert not cfg.chunk_unroll  # stash HBM x unroll OOMs on TPU
        assert cfg.grad_accum_chunks == 0  # AUTO <=8 live stash grids

    def test_cli_parsing_and_negative_bools(self):
        cfg = get_config([
            "--batch_size", "256", "--no-use_mask", "--lr", "1e-3",
            "--decay_step", "5", "10",
        ])
        assert cfg.batch_size == 256
        assert not cfg.use_mask  # the reference could never disable these
        assert cfg.lr == pytest.approx(1e-3)
        assert cfg.decay_step == (5, 10)

    def test_testit_forces_one_epoch(self):
        cfg = get_config(["--testit"])
        assert cfg.num_epochs == 1

    def test_json_roundtrip(self):
        cfg = Config(batch_size=64, exp_name="x")
        cfg2 = Config.from_json(cfg.to_json())
        assert cfg2 == cfg

    def test_square_batch_enforced(self):
        with pytest.raises(ValueError):
            _ = Config(batch_size=1000).grid_hw


class TestCameraPath:
    def test_euler_identity(self):
        from crnerf_tpu.render.camera_path import euler_to_rotmat

        np.testing.assert_allclose(
            euler_to_rotmat((0, 0, 0)), np.eye(3), atol=1e-12
        )

    def test_piecewise_counts(self):
        from crnerf_tpu.render.camera_path import piecewise_linspace

        v = piecewise_linspace([(0, 1, 0.5), (1, 0, 0.5)], 11)
        assert v.shape == (11,)
        assert v[0] == 0 and abs(v[-1]) < 1e-9

    def test_preset_poses(self):
        from crnerf_tpu.render.camera_path import (
            DEMO_ANCHORS, PATH_PRESETS, fov_intrinsics, resolve_scene,
        )

        spec = PATH_PRESETS["brandenburg_gate"]
        poses = spec.poses(DEMO_ANCHORS["brandenburg_gate"])
        assert poses.shape == (240, 3, 4)
        # rotations stay orthonormal
        RRt = np.einsum("nij,nkj->nik", poses[:, :, :3], poses[:, :, :3])
        np.testing.assert_allclose(
            RRt, np.tile(np.eye(3), (240, 1, 1)), atol=1e-4
        )
        assert resolve_scene("ckpt_brandenburg_gate") == "brandenburg_gate"
        K = fov_intrinsics((320, 240), 60.0)
        assert K[0, 0] == pytest.approx(320 / 2 / np.tan(np.pi / 6))

    def test_path_rays_shapes(self):
        from crnerf_tpu.render.camera_path import (
            DEMO_ANCHORS, PATH_PRESETS, test_path_rays,
        )

        spec = PATH_PRESETS["trevi_fountain"]
        spec = type(spec)(**{
            **{f: getattr(spec, f) for f in spec.__dataclass_fields__},
            "n_frames": 3,
        })
        rays = list(test_path_rays(
            spec, DEMO_ANCHORS["trevi_fountain"], (16, 12), 0.0, 5.0
        ))
        assert len(rays) == 3
        assert rays[0].shape == (16 * 12, 8)
        np.testing.assert_allclose(rays[0][:, 6], 0.0)
        np.testing.assert_allclose(rays[0][:, 7], 5.0)

    @staticmethod
    def _ref_path(anchor, dx, dy, dz, tx, ty, tz):
        """Direct transcription of the reference pose loop
        (eval.py:177-183 and twins): translation offsets then a euler
        left-multiply of the rotation block."""
        from crnerf_tpu.render.camera_path import euler_to_rotmat

        n = len(ty)
        poses = np.tile(np.asarray(anchor, np.float64), (n, 1, 1))
        for i in range(n):
            poses[i, 0, 3] += dx[i]
            poses[i, 1, 3] += dy[i]
            poses[i, 2, 3] += dz[i]
            poses[i, :, :3] = np.dot(
                euler_to_rotmat([tx[i], ty[i], tz[i]]), poses[i, :, :3]
            )
        return poses

    def test_presets_match_reference_arrays(self):
        """PATH_PRESETS must reproduce the reference's EFFECTIVE pose
        sequences (eval.py:156-268) to 1e-6, including the brandenburg
        quirk: its dx concat is 360 long but only the first N_frames=240
        entries are consumed, so the second segment never renders."""
        from crnerf_tpu.render.camera_path import DEMO_ANCHORS, PATH_PRESETS

        N = 240
        pi = np.pi
        anchor = DEMO_ANCHORS["brandenburg_gate"]

        # --- brandenburg (eval.py:156-183)
        dx = np.concatenate([
            np.linspace(-0.25, 0.25, N),
            np.linspace(0.25, 0.38, N - N // 2),
        ])[:N]
        dy = np.concatenate([np.linspace(0.05, -0.1, N // 2),
                             np.linspace(-0.1, 0.05, N - N // 2)])
        dz = np.concatenate([np.linspace(0.1, 0.3, N // 2),
                             np.linspace(0.3, 0.1, N - N // 2)])
        tx = np.concatenate([np.linspace(pi / 30, 0, N // 2),
                             np.linspace(0, pi / 30, N - N // 2)])
        ty = np.linspace(pi / 10, -pi / 10, N)
        tz = np.zeros(N)
        ref = self._ref_path(anchor, dx, dy, dz, tx, ty, tz)
        ours = PATH_PRESETS["brandenburg_gate"].poses(anchor)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

        # --- sacre coeur (eval.py:233-268)
        dx = np.linspace(-2, 2, N)
        dy = np.concatenate([np.linspace(-0.0, 2, N // 2),
                             np.linspace(2, -0.0, N - N // 2)])
        dz = np.concatenate([np.linspace(0, -3, N // 2),
                             np.linspace(-3, 0, N - N // 2)])
        tx = np.zeros(N)
        ty = np.linspace(pi / 6, -pi / 6, N)
        ref = self._ref_path(anchor, dx, dy, dz, tx, ty, tz)
        ours = PATH_PRESETS["sacre_coeur"].poses(anchor)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

        # --- trevi (eval.py:199-226)
        dx = np.linspace(-0.8, 0.7, N)
        dy = np.concatenate([np.linspace(-0.0, 0.05, N // 2),
                             np.linspace(0.05, -0.0, N - N // 2)])
        dz = np.concatenate([
            np.linspace(0.4, 0.1, N // 4), np.linspace(0.1, 0.5, N // 4),
            np.linspace(0.5, 0.1, N // 4),
            np.linspace(0.1, 0.4, N - 3 * (N // 4)),
        ])
        ref = self._ref_path(anchor, dx, dy, dz, tx, ty, tz)
        ours = PATH_PRESETS["trevi_fountain"].poses(anchor)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_pose_anchor_ids(self):
        """Anchor/appearance split mirrors eval.py:178,226,258."""
        from crnerf_tpu.render.camera_path import PATH_PRESETS

        b = PATH_PRESETS["brandenburg_gate"]
        assert (b.appearance_train_idx, b.pose_image_id) == (314, 1123)
        s = PATH_PRESETS["sacre_coeur"]
        assert (s.appearance_train_idx, s.pose_train_idx) == (58, 99)
        t = PATH_PRESETS["trevi_fountain"]
        assert (t.appearance_train_idx, t.pose_train_idx) == (1548, 1548)


class TestMetricProtocol:
    def test_right_half_only(self):
        from crnerf_tpu.apps.eval_metric import score_pair

        rng = np.random.RandomState(0)
        gt = rng.uniform(0, 1, (16, 20, 3)).astype(np.float32)
        pred = gt.copy()
        pred[:, :10] = 0  # corrupt LEFT half only
        s = score_pair(pred, gt)
        assert s["mse"] == pytest.approx(0.0, abs=1e-10)
        assert s["psnr"] > 60

    def test_detects_right_half_error(self):
        from crnerf_tpu.apps.eval_metric import score_pair

        rng = np.random.RandomState(0)
        gt = rng.uniform(0, 1, (16, 20, 3)).astype(np.float32)
        pred = gt.copy()
        pred[:, 10:] = np.clip(pred[:, 10:] + 0.1, 0, 1)
        s = score_pair(pred, gt)
        assert s["mse"] > 1e-4


class TestLoggingAndViz:
    def test_metric_logger_jsonl(self, tmp_path):
        from crnerf_tpu.utils.logging import MetricLogger

        lg = MetricLogger(str(tmp_path), "exp")
        lg.log({"train/loss": 0.5, "lr": 1e-3}, step=10)
        lg.log({"val/psnr": 21.0}, step=20)
        lg.close()
        rows = [
            json.loads(l)
            for l in open(tmp_path / "exp" / "metrics.jsonl")
        ]
        assert rows[0]["train/loss"] == 0.5 and rows[0]["step"] == 10
        assert rows[1]["val/psnr"] == 21.0

    def test_save_code_snapshot(self, tmp_path):
        from crnerf_tpu.utils.logging import save_code

        save_code(str(tmp_path), "exp", Config().to_json())
        assert os.path.exists(
            tmp_path / "logs" / "exp" / "codes" / "config.json"
        )
        assert os.path.exists(
            tmp_path / "logs" / "exp" / "codes" / "crnerf_tpu" / "config.py"
        )

    def test_visualize_depth(self):
        from crnerf_tpu.utils.visualization import visualize_depth

        d = np.linspace(0, 1, 12).reshape(3, 4)
        img = visualize_depth(d)
        assert img.shape == (3, 4, 3)
        assert img.min() >= 0 and img.max() <= 1
        flat = visualize_depth(d.reshape(-1), wh=(4, 3))
        assert flat.shape == (3, 4, 3)


class TestDispatcher:
    def test_command_table(self):
        from crnerf_tpu.__main__ import COMMANDS

        # Reference's five entry points (SURVEY.md §2.6) plus `serve`,
        # the resident render server this framework adds beyond parity.
        assert set(COMMANDS) == {
            "prepare", "train", "eval", "metrics", "video", "serve"
        }
        import importlib

        for mod in COMMANDS.values():
            m = importlib.import_module(mod)
            assert hasattr(m, "main")


class TestGraftEntry:
    def test_entry_is_jittable_tiny(self):
        """entry() builds the full-size model; here just check the module
        imports and the tiny system used by dryrun compiles."""
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)
        )))
        import __graft_entry__ as g

        cfg, system = g._make_system(tiny=True)
        import jax

        variables = system.init(jax.random.PRNGKey(0))
        batch = g._example_batch(cfg, jax.random.PRNGKey(1))

        def fn(variables, batch, key):
            results, _ = system.forward(variables, batch, key, train=True)
            return results["rgb_fine"]

        out = jax.jit(fn)(variables, batch, jax.random.PRNGKey(2))
        assert out.shape == (cfg.batch_size, 3)
        assert bool(jax.numpy.isfinite(out).all())


class TestTrainerResume:
    def test_fit_checkpoint_resume(self, tmp_path):
        """Train 1 epoch, checkpoint, build a FRESH trainer pointed at the
        checkpoint dir, confirm step/params/cache restore (the reference
        loses its embedding list on resume — SURVEY.md §2.7)."""
        import jax
        import numpy as np

        from crnerf_tpu.data import make_synthetic_scene
        from crnerf_tpu.train.loop import Trainer

        cfg = Config(
            batch_size=16, N_samples=4, N_importance=4, netdepth=2,
            netwidth=16, nerf_out_dim=8, N_vocab=10,
            appearance_wh=(32, 24), chunk=256, num_epochs=1, lr=5e-4,
            save_dir=str(tmp_path), exp_name="resume", log_every=1000,
            dataset_name="synthetic", num_devices=1,
        )
        scene = make_synthetic_scene(
            appearance_wh=(32, 24), img_wh=(24, 18), n_train=2, n_test=1
        )
        tr = Trainer(cfg, scene)
        tr.fit()
        step0 = int(jax.device_get(tr.state.step))
        valid0 = np.asarray(jax.device_get(tr.state.embedding_valid))
        leaf0 = np.asarray(
            jax.device_get(jax.tree.leaves(tr.state.params)[0])
        )
        assert step0 > 0 and valid0.sum() > 0

        ckpt_dir = tr.ckpt.directory
        tr.ckpt.close()
        tr2 = Trainer(cfg.replace(ckpt_path=ckpt_dir), scene)
        assert int(jax.device_get(tr2.state.step)) == step0
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(tr2.state.embedding_valid)), valid0
        )
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(jax.tree.leaves(tr2.state.params)[0])),
            leaf0,
        )
        # resumed fit() continues rather than restarting epoch 0
        assert tr2.fit() is not None

    def test_preemption_stop_resume_is_exact(self, tmp_path):
        """request_stop checkpoints mid-epoch; a resumed run replays the
        REMAINING (epoch, step) batch sequence and ends bitwise-identical
        to an uninterrupted run — preemption-transparent training (the
        reference loses all mid-epoch progress — SURVEY.md §5.3)."""
        import jax
        import numpy as np

        from crnerf_tpu.data import make_synthetic_scene
        from crnerf_tpu.train.loop import Trainer

        def mkcfg(name):
            return Config(
                batch_size=16, N_samples=4, N_importance=4, netdepth=2,
                netwidth=16, nerf_out_dim=8, N_vocab=10,
                appearance_wh=(32, 24), chunk=256, num_epochs=1, lr=5e-4,
                save_dir=str(tmp_path), exp_name=name, log_every=1000,
                dataset_name="synthetic", num_devices=1,
            )

        scene = make_synthetic_scene(
            appearance_wh=(32, 24), img_wh=(24, 18), n_train=2, n_test=1
        )
        # uninterrupted run
        tr_a = Trainer(mkcfg("uninterrupted"), scene)
        tr_a.fit()
        ref_leaves = jax.tree.leaves(jax.device_get(tr_a.state))
        full_steps = int(jax.device_get(tr_a.state.step))
        assert full_steps >= 4
        tr_a.ckpt.close()

        # interrupted at step 3 of the epoch
        tr_b = Trainer(mkcfg("preempted"), scene)
        orig_step, seen = tr_b.step_fn, {"n": 0}

        def step_and_preempt(state, batch):
            out = orig_step(state, batch)
            seen["n"] += 1
            if seen["n"] == 3:
                tr_b.request_stop()  # what the SIGTERM handler calls
            return out

        tr_b.step_fn = step_and_preempt
        tr_b.fit()
        assert int(jax.device_get(tr_b.state.step)) == 3
        ckpt_dir = tr_b.ckpt.directory
        assert tr_b.ckpt.latest_step() == 3  # checkpointed at the stop
        tr_b.ckpt.close()

        # relaunch: finishes the interrupted epoch from step 3
        tr_c = Trainer(mkcfg("preempted").replace(ckpt_path=ckpt_dir),
                       scene)
        tr_c.fit()
        assert int(jax.device_get(tr_c.state.step)) == full_steps
        for a, b in zip(
            ref_leaves, jax.tree.leaves(jax.device_get(tr_c.state))
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        tr_c.ckpt.close()

    def test_auto_resume(self, tmp_path):
        """auto_resume picks up the exp dir's latest checkpoint without a
        manual --ckpt_path (preemption recovery; the reference only has
        manual resume_from_checkpoint — SURVEY.md §5.3)."""
        import jax

        from crnerf_tpu.data import make_synthetic_scene
        from crnerf_tpu.train.loop import Trainer

        cfg = Config(
            batch_size=16, N_samples=4, N_importance=4, netdepth=2,
            netwidth=16, nerf_out_dim=8, N_vocab=10,
            appearance_wh=(32, 24), chunk=256, num_epochs=1, lr=5e-4,
            save_dir=str(tmp_path), exp_name="autores", log_every=1000,
            dataset_name="synthetic", num_devices=1, auto_resume=True,
        )
        scene = make_synthetic_scene(
            appearance_wh=(32, 24), img_wh=(24, 18), n_train=2, n_test=1
        )
        tr = Trainer(cfg, scene)
        assert int(jax.device_get(tr.state.step)) == 0  # no ckpt yet
        tr.fit()
        step0 = int(jax.device_get(tr.state.step))
        tr.ckpt.close()
        # simulated relaunch after preemption: same cfg, no ckpt_path
        tr2 = Trainer(cfg, scene)
        assert int(jax.device_get(tr2.state.step)) == step0 > 0
        tr2.ckpt.close()
        # a different exp dir still starts fresh
        tr3 = Trainer(cfg.replace(exp_name="autores2"), scene)
        assert int(jax.device_get(tr3.state.step)) == 0
        tr3.ckpt.close()


class TestSlabDispatch:
    """Config.steps_per_dispatch: the Trainer's slab-scan feeding must be
    stream-identical to per-step feeding (same sampler draws, same step
    math — only the dispatch granularity changes)."""

    @staticmethod
    def _mkcfg(tmp_path, name, slab, ndev=1, grids=2):
        return Config(
            batch_size=16, N_samples=4, N_importance=4, netdepth=2,
            netwidth=16, nerf_out_dim=8, N_vocab=10,
            appearance_wh=(32, 24), chunk=256, num_epochs=2, lr=5e-4,
            save_dir=str(tmp_path), exp_name=name, log_every=1000,
            dataset_name="synthetic", num_devices=ndev,
            grids_per_step=grids, steps_per_dispatch=slab,
        )

    @staticmethod
    def _scene():
        from crnerf_tpu.data import make_synthetic_scene

        return make_synthetic_scene(
            appearance_wh=(32, 24), img_wh=(24, 18), n_train=2, n_test=1
        )

    def _run(self, cfg, scene, iters=7):
        import jax

        from crnerf_tpu.train.loop import Trainer

        tr = Trainer(cfg, scene)
        tr.iters_per_epoch = iters  # 7 with slab 3 -> slabs 3+3+1 (two
        # compiled shapes: full + remainder)
        tr.fit()
        tr.ckpt.close()
        return jax.device_get(tr.state)

    def _assert_states_match(self, sa, sb, atol, rtol):
        """Near-equality, not bitwise: jit(step) and jit(scan(step)) are
        different XLA programs whose fusion choices round differently
        (measured one-step max |Δ| ≈ 2.4e-6 f32 on this model). Adam's
        normalized updates turn that into trajectory drift of up to
        ~2·lr per element over the 10-14 steps the fit-level tests run
        (measured max |Δ| ≈ 1.1e-3 at lr=5e-4) — so the fit-level
        comparisons are trajectory-band checks; the TIGHT equivalence
        lives in test_single_slab_matches_per_step (same initial state,
        one slab) and the bitwise stream check below."""
        import jax

        assert int(sa.step) == int(sb.step)
        for a, b in zip(jax.tree.leaves(sa), jax.tree.leaves(sb)):
            np.testing.assert_allclose(
                np.asarray(a, np.float64), np.asarray(b, np.float64),
                rtol=rtol, atol=atol,
            )

    def test_single_slab_matches_per_step(self, tmp_path):
        """From the SAME initial state, one scan_fn slab of 3 steps must
        match 3 sequential step_fn dispatches to float-rounding level
        (the only allowed difference is XLA fusion rounding between the
        two compiled programs; one-step measured ≈ 2.4e-6)."""
        import jax
        import jax.numpy as jnp

        scene = self._scene()
        from crnerf_tpu.train.loop import Trainer

        tr = Trainer(
            self._mkcfg(tmp_path, "oneslab", 3).replace(
                donate_state=False
            ),
            scene,
        )
        tr.iters_per_epoch = 7
        state_a = tr.state
        for i in range(3):
            b = tr.pipeline.make_global_batch(0, i, 2)
            state_a, _ = tr.step_fn(state_a, jax.tree.map(jnp.asarray, b))
        xs = tr._stage_slab(0, 0, 3)
        state_b, _ = tr.scan_fn(tr.state, xs, tr._slab_aux)
        tr.ckpt.close()
        self._assert_states_match(
            jax.device_get(state_a), jax.device_get(state_b),
            atol=1e-4, rtol=1e-4,
        )

    @pytest.mark.parametrize("slab_data", ["host", "device"])
    def test_slab_stream_bitwise_identical(self, tmp_path, slab_data):
        """The staged slab IS the per-step batch stream, bitwise, in BOTH
        staging modes: same sampler draws in the same order, and the
        on-device gathers (whole_img from the resident appearance stack;
        with slab_data='device' also rays/ts/rgbs from the resident ray
        and rgb buffers by the staged int32 ray_idx) reproduce the
        host-staged per-step batch exactly."""
        import jax
        import jax.numpy as jnp

        scene = self._scene()
        from crnerf_tpu.train.loop import Trainer

        cfg = self._mkcfg(tmp_path, f"slabstream_{slab_data}", 3).replace(
            slab_data=slab_data
        )
        tr = Trainer(cfg, scene)
        assert tr._slab_device_data == (slab_data == "device")
        tr.iters_per_epoch = 7
        xs = jax.device_get(tr._stage_slab(0, 0, 3))
        aux = jax.device_get(tr._slab_aux)
        for i in range(3):
            ref = tr.pipeline.make_global_batch(0, i, 2)
            wi = ref.pop("whole_img")
            if slab_data == "device":
                # reconstruct exactly as the scan body does (loop.py
                # per_step): pure takes from the resident buffers
                ridx = xs["ray_idx"][i]
                rows = aux["rays"][ridx]
                assert np.array_equal(rows[..., :8], ref["rays"])
                assert np.array_equal(
                    rows[..., 8].astype(np.int32), ref["ts"]
                )
                assert np.array_equal(aux["rgb"][ridx], ref["rgbs"])
                for k in ("uv_pix", "image_idx"):
                    assert np.array_equal(np.asarray(xs[k][i]), ref[k]), k
            else:
                for k, v in ref.items():
                    assert np.array_equal(np.asarray(xs[k][i]), v), k
            gathered = jnp.expand_dims(
                jnp.take(jnp.asarray(aux["app"]),
                         jnp.asarray(ref["image_idx"]), axis=0), -4)
            assert np.array_equal(np.asarray(gathered), wi)
        tr.ckpt.close()

    @pytest.mark.slow
    def test_slab_device_gather_matches_host_fit(self, tmp_path):
        """End-to-end fit() with slab_data='device' vs 'host': identical
        program structure would make these bitwise, but the gathers move
        into the jitted scan (different XLA program), so this is the
        same trajectory-band check as the other fit-level tests."""
        scene = self._scene()
        sa = self._run(
            self._mkcfg(tmp_path, "slabhost", 3).replace(
                slab_data="host"
            ),
            scene,
        )
        sb = self._run(
            self._mkcfg(tmp_path, "slabdev", 3).replace(
                slab_data="device"
            ),
            scene,
        )
        self._assert_states_match(sa, sb, atol=5e-3, rtol=5e-2)

    @pytest.mark.slow
    def test_slab_matches_per_step_single_device(self, tmp_path):
        scene = self._scene()
        sa = self._run(self._mkcfg(tmp_path, "perstep", 0), scene)
        sb = self._run(self._mkcfg(tmp_path, "slab", 3), scene)
        self._assert_states_match(sa, sb, atol=5e-3, rtol=5e-2)

    @pytest.mark.slow
    def test_slab_matches_per_step_two_devices(self, tmp_path):
        """(D=2, G=2) layout through shard_train_scan: the sharded slab
        scan must equal the per-step shard_map stream."""
        scene = self._scene()
        sa = self._run(
            self._mkcfg(tmp_path, "perstep2d", 0, ndev=2), scene, iters=5
        )
        sb = self._run(
            self._mkcfg(tmp_path, "slab2d", 2, ndev=2), scene, iters=5
        )
        self._assert_states_match(sa, sb, atol=5e-3, rtol=5e-2)

    @pytest.mark.slow
    def test_slab_preemption_at_boundary_resumes_exact(self, tmp_path):
        """A stop lands at a slab boundary; the resumed run replays the
        remaining (epoch, step) sequence and ends identical to an
        uninterrupted slab run."""
        import jax

        from crnerf_tpu.train.loop import Trainer

        scene = self._scene()
        ref = self._run(self._mkcfg(tmp_path, "slab_ref", 3), scene)

        tr = Trainer(self._mkcfg(tmp_path, "slab_pre", 3), scene)
        tr.iters_per_epoch = 7
        orig, seen = tr.scan_fn, {"n": 0}

        def scan_and_preempt(state, xs, aux):
            out = orig(state, xs, aux)
            seen["n"] += 1
            if seen["n"] == 2:  # after the second slab (step 6)
                tr.request_stop()
            return out

        tr.scan_fn = scan_and_preempt
        tr.fit()
        assert int(jax.device_get(tr.state.step)) == 6
        ckpt_dir = tr.ckpt.directory
        assert tr.ckpt.latest_step() == 6
        tr.ckpt.close()

        tr2 = Trainer(
            self._mkcfg(tmp_path, "slab_pre", 3).replace(
                ckpt_path=ckpt_dir
            ),
            scene,
        )
        tr2.iters_per_epoch = 7
        tr2.fit()
        tr2.ckpt.close()
        # slab-vs-slab (same compiled program, replayed stream): tight
        self._assert_states_match(
            ref, jax.device_get(tr2.state), atol=2e-6, rtol=2e-6
        )


class TestTrainPanels:
    def test_panels_written_during_fit(self, tmp_path):
        """img_panel_every logs gt/pred/random/mask panels from the live
        training grid (reference wandb panels every 5000 steps,
        train…py:299-335)."""
        import glob

        import jax

        from crnerf_tpu.data import make_synthetic_scene
        from crnerf_tpu.train.loop import Trainer
        from crnerf_tpu.utils.logging import MetricLogger

        cfg = Config(
            batch_size=16, N_samples=4, N_importance=4, netdepth=2,
            netwidth=16, nerf_out_dim=8, N_vocab=10,
            appearance_wh=(32, 24), chunk=256, num_epochs=1, lr=5e-4,
            save_dir=str(tmp_path), exp_name="panels", log_every=1000,
            dataset_name="synthetic", num_devices=1, img_panel_every=2,
        )
        scene = make_synthetic_scene(
            appearance_wh=(32, 24), img_wh=(24, 18), n_train=2, n_test=1
        )
        logger = MetricLogger(str(tmp_path / "logs"), "panels")
        tr = Trainer(cfg, scene, logger=logger)
        tr.fit()
        logger.close()
        imgs = glob.glob(str(tmp_path / "logs" / "panels" / "images" / "*"))
        names = {os.path.basename(p).rsplit("_", 1)[0] for p in imgs}
        assert {"train_gt", "train_pred", "train_pred_random",
                "train_mask"} <= names


class TestSsimIndependentReference:
    def test_matches_scipy_mirror(self):
        """Our kornia-semantics SSIM vs an independent scipy implementation
        (mode='mirror' == torch reflect padding)."""
        import numpy as np
        import scipy.ndimage as ndi
        import jax.numpy as jnp

        from crnerf_tpu.train.metrics import ssim

        def np_ssim(a, b, win=3, sigma=1.5, max_val=1.0):
            c1, c2 = (0.01 * max_val) ** 2, (0.03 * max_val) ** 2
            x = np.arange(win) - (win - 1) / 2
            g = np.exp(-x ** 2 / (2 * sigma ** 2))
            g /= g.sum()
            k = np.outer(g, g)

            def f(im):
                out = np.zeros_like(im)
                for c in range(im.shape[-1]):
                    out[..., c] = ndi.correlate(
                        im[..., c], k, mode="mirror"
                    )
                return out

            mu1, mu2 = f(a), f(b)
            s1 = f(a * a) - mu1 ** 2
            s2 = f(b * b) - mu2 ** 2
            s12 = f(a * b) - mu1 * mu2
            m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
                (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2)
            )
            return float(m.mean())

        rng = np.random.RandomState(0)
        a = rng.uniform(0, 1, (20, 24, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(
            np.float32
        )
        ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        ref = np_ssim(a, b)
        assert abs(ours - ref) < 1e-5


class TestPhototourismPipeline:
    def test_prepare_train_eval_metrics(self, tmp_path):
        """The reference's full workflow (SURVEY.md §3.1-3.2) on a COLMAP
        fixture: cache build -> CLI train -> render test split -> right-
        half metrics."""
        import glob

        from test_data import _write_phototourism_fixture

        from crnerf_tpu.apps.prepare import main as prepare_main
        from crnerf_tpu.apps.train import main as train_main
        from crnerf_tpu.apps.eval import main as eval_main
        from crnerf_tpu.apps.eval_metric import main as metric_main

        root = str(tmp_path / "scene")
        out = str(tmp_path / "out")
        _write_phototourism_fixture(root)

        prepare_main(["--root_dir", root, "--img_downscale", "2",
                      "--appearance_wh", "32", "24"])
        assert os.path.exists(f"{root}/cache_tpu/scene_ds2.npz")

        common = ["--root_dir", root, "--dataset_name", "phototourism",
                  "--img_downscale", "2", "--batch_size", "16",
                  "--N_samples", "4", "--N_importance", "4",
                  "--netdepth", "2", "--netwidth", "16",
                  "--nerf_out_dim", "8", "--N_vocab", "16",
                  "--appearance_wh", "32", "24", "--chunk", "256",
                  "--save_dir", out]
        train_main(common + ["--num_epochs", "1", "--exp_name", "pt",
                             "--log_every", "1000"])
        eval_main(common + ["--split", "test_test",
                            "--ckpt_path", f"{out}/ckpts/pt",
                            "--scene_name", "scene"])
        assert len(
            glob.glob(f"{out}/results/phototourism/scene/*.png")
        ) == 1
        m = metric_main(["--root_dir", root,
                         "--dataset_name", "phototourism",
                         "--scene_name", "scene", "--save_dir", out,
                         "--img_downscale", "2"])
        assert np.isfinite(m["psnr"]) and np.isfinite(m["ssim"])

        # camera-path split with --video_format mp4 (reference
        # eval.py:301-304); this image has no mp4 backend, so the
        # documented fallback must write a gif and warn loudly
        with pytest.warns(UserWarning, match="mp4 backend unavailable"):
            eval_main(common + [
                "--split", "test", "--ckpt_path", f"{out}/ckpts/pt",
                "--scene_name", "scene_brandenburg_gate",
                "--video_format", "mp4", "--num_frames", "2",
                "--img_wh", "32", "24",
            ])
        path_dir = f"{out}/results/phototourism/scene_brandenburg_gate"
        assert len(glob.glob(f"{path_dir}/0*.png")) == 2
        assert os.path.exists(f"{path_dir}/scene_brandenburg_gate.gif")

        # video demo app on the same checkpoint (reference
        # appearance_modification_video.py): one style image, 2 frames
        from PIL import Image as PILImage

        from crnerf_tpu.apps.video import main as video_main

        style_dir = str(tmp_path / "styles")
        os.makedirs(style_dir, exist_ok=True)
        rng = np.random.RandomState(1)
        PILImage.fromarray(
            rng.randint(0, 255, (24, 32, 3), dtype=np.uint8)
        ).save(os.path.join(style_dir, "art.png"))
        video_main([
            "--ckpt_path", f"{out}/ckpts/pt/weights.npz",
            "--scene_name", "scene_brandenburg_gate",
            "--style_dir", style_dir, "--save_dir", out,
            "--img_wh", "32", "24", "--N_samples", "4",
            "--N_importance", "4", "--chunk", "256", "--n_frames", "2",
            "--netdepth", "2", "--netwidth", "16",
            "--nerf_out_dim", "8", "--appearance_wh", "32", "24",
        ])
        vdir = f"{out}/video/scene_brandenburg_gate/art"
        assert len(glob.glob(f"{vdir}/0*.png")) == 2
        assert os.path.exists(f"{vdir}/art.gif")

        # a half-finished render dir must fail loudly, not score a
        # healthy-looking mean over the frames that do exist
        os.remove(glob.glob(f"{out}/results/phototourism/scene/*.png")[0])
        with pytest.raises(FileNotFoundError, match="expected 1 renders"):
            metric_main(["--root_dir", root,
                         "--dataset_name", "phototourism",
                         "--scene_name", "scene", "--save_dir", out,
                         "--img_downscale", "2"])


class TestBlenderPipeline:
    def test_cli_train_on_blender_fixture(self, tmp_path):
        """CLI training on a Blender-layout scene with perturbations
        (reference blender_mask_grid_sample path)."""
        import json

        import numpy as np
        from PIL import Image as PILImage

        from crnerf_tpu.apps.train import main as train_main

        root = str(tmp_path / "lego")
        os.makedirs(root, exist_ok=True)
        rng = np.random.RandomState(0)
        frames = []
        for t in range(3):
            name = f"r_{t}"
            arr = np.zeros((400, 400, 4), np.uint8)
            arr[..., :3] = rng.randint(0, 255, (400, 400, 3))
            arr[..., 3] = 255
            PILImage.fromarray(arr, "RGBA").save(
                os.path.join(root, name + ".png")
            )
            pose = np.eye(4)
            pose[2, 3] = 4.0
            pose[0, 3] = 0.3 * t
            frames.append(
                {"file_path": name, "transform_matrix": pose.tolist()}
            )
        with open(os.path.join(root, "transforms_train.json"), "w") as f:
            json.dump({"camera_angle_x": 0.6911, "frames": frames}, f)

        out = str(tmp_path / "out")
        train_main([
            "--root_dir", root, "--dataset_name", "blender",
            "--img_wh", "32", "32", "--data_perturb", "color", "occ",
            "--batch_size", "16", "--N_samples", "4",
            "--N_importance", "4", "--netdepth", "2", "--netwidth", "16",
            "--nerf_out_dim", "8", "--N_vocab", "8",
            "--appearance_wh", "32", "24", "--chunk", "256",
            "--num_epochs", "1", "--save_dir", out,
            "--exp_name", "bl", "--log_every", "1000",
        ])
        assert os.path.exists(f"{out}/ckpts/bl/weights.npz")
