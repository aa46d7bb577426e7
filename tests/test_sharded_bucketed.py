"""Mesh-sharded BUCKETED eval renders == single-device pixels.

r4 verdict weak #2 / directive 2: multi-chip eval must ride the SAME
production renderer (quarter-octave buckets, cam-rays dispatch, masked
style stats, u8 fetch) instead of the per-shape ``shard_render`` path.
These tests pin, on the 8-device virtual CPU mesh, that the sharded
bucketed programs (render/inference.py ``_fn_bucketed_cam_sharded`` /
``_fn_bucketed_sharded``) reproduce the single-device programs'
pixels across >= 2 distinct buckets, for both the cam-in and host-ray
dispatch forms, and that program caching stays per-(bucket, outputs).
"""

import numpy as np
import pytest

from crnerf_tpu.config import Config


def _cfg(**kw):
    base = dict(
        batch_size=64, N_samples=4, N_importance=4, netdepth=2,
        netwidth=32, nerf_out_dim=16, N_vocab=16,
        appearance_wh=(64, 48), chunk=2048, use_mask=True,
        encode_a=True, encode_random=False, encode_c=False,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def setup():
    import jax

    from crnerf_tpu.parallel.mesh import make_mesh
    from crnerf_tpu.render.inference import Renderer
    from crnerf_tpu.render.system import CrNerfSystem

    cfg = _cfg()
    system = CrNerfSystem(cfg)
    variables = system.init(jax.random.PRNGKey(0))
    single = Renderer(cfg, variables, system)
    sharded = Renderer(cfg, variables, system, mesh=make_mesh(8))
    return cfg, single, sharded


# two frame sizes landing in DIFFERENT quarter-octave buckets:
# 64x64 = 4096 px -> bucket 4096; 60x70 = 4200 px -> bucket 5120
FRAMES = [((64, 64), 4096), ((70, 60), 5120)]  # ((h, w), bucket)


def _camera(hw):
    h, w = hw
    c2w = np.eye(3, 4, dtype=np.float32)
    c2w[:, 3] = [0.1, -0.2, 2.5]
    K = np.array(
        [[0.9 * w, 0, w / 2], [0, 0.9 * w, h / 2], [0, 0, 1]],
        np.float32,
    )
    return c2w, K, 0.5, 4.0


def _style(cfg, seed=3):
    wa, ha = cfg.appearance_wh
    rng = np.random.RandomState(seed)
    return (rng.uniform(-1, 1, (1, ha, wa, 3))).astype(np.float32)


class TestShardedBucketedCam:
    @pytest.mark.parametrize("hw,bucket", FRAMES)
    def test_pixels_match_single_device(self, setup, hw, bucket):
        cfg, single, sharded = setup
        c2w, K, near, far = _camera(hw)
        style = _style(cfg)
        outs = []
        for r in (single, sharded):
            assert r.bucket_for(hw[0] * hw[1]) == bucket
            out = r.fetch(
                r.render_frame_cam_async(c2w, K, near, far, hw, style)
            )
            outs.append(out)
        a, b = outs
        assert a["rgb"].shape == b["rgb"].shape == (*hw, 3)
        np.testing.assert_allclose(a["rgb"], b["rgb"], atol=2e-5,
                                   rtol=1e-5)
        np.testing.assert_allclose(a["depth"], b["depth"], atol=2e-5,
                                   rtol=1e-5)
        np.testing.assert_allclose(a["mask"], b["mask"], atol=2e-5,
                                   rtol=1e-5)

    def test_u8_within_one_level(self, setup):
        """The production u8 path: device-quantized frames agree to at
        most one quantization level."""
        cfg, single, sharded = setup
        hw = FRAMES[0][0]
        c2w, K, near, far = _camera(hw)
        style = _style(cfg)
        u8 = [
            r.fetch(
                r.render_frame_cam_async(
                    c2w, K, near, far, hw, style, outputs="rgb_u8"
                )
            )["rgb_u8"]
            for r in (single, sharded)
        ]
        diff = np.abs(u8[0].astype(np.int32) - u8[1].astype(np.int32))
        assert diff.max() <= 1, f"max u8 delta {diff.max()}"

    def test_cache_is_per_bucket(self, setup):
        """After rendering both frame sizes the sharded renderer holds
        one cam program per (bucket, outputs) — image shapes never key
        compiles (the <= 4-compiles-per-2x-band property on the mesh)."""
        _, _, sharded = setup
        kinds = {k[0] for k in sharded._cache}
        assert kinds <= {"bucket_cam_sh", "bucket_sh"}
        assert set(sharded.stats()["buckets"]) >= {4096, 5120}


class TestShardedBucketedHostRays:
    @pytest.mark.parametrize("hw,bucket", FRAMES)
    def test_pixels_match_single_device(self, setup, hw, bucket):
        """cam_rays-off form: host-built rays sharded on the ray axis."""
        import jax

        cfg, single, sharded = setup
        h, w = hw
        c2w, K, near, far = _camera(hw)
        from crnerf_tpu.core.rays import get_ray_directions, make_ray_buffer

        dirs = get_ray_directions(h, w, K)
        rays = make_ray_buffer(dirs, c2w, near, far, 0)[:, :8]
        style = _style(cfg)
        key = jax.random.PRNGKey(0)
        outs = [
            r.fetch(r.render_frame_async(rays, style, hw, key))
            for r in (single, sharded)
        ]
        a, b = outs
        np.testing.assert_allclose(a["rgb"], b["rgb"], atol=2e-5,
                                   rtol=1e-5)
        np.testing.assert_allclose(a["depth"], b["depth"], atol=2e-5,
                                   rtol=1e-5)
