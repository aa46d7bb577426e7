"""Resolution-bucketed full-image rendering (render/inference.py).

The bucketed path (pad rays to power-of-two buckets, masked style stats,
pixel-center mask gather) must produce the SAME images as the exact
per-resolution path, and rendering several distinct image sizes must cost
a single bucket compile (SURVEY.md §7 hard part 1; reference behavior
being replaced: eval.py:271-283 renders each size at its own shape)."""

import numpy as np
import pytest

import jax

from crnerf_tpu.config import Config
from crnerf_tpu.data import make_synthetic_scene
from crnerf_tpu.data.pipeline import full_image_batch
from crnerf_tpu.render.inference import Renderer, bucket_size
from crnerf_tpu.render.system import CrNerfSystem

CFG = dict(
    batch_size=16, N_samples=4, N_importance=4, netdepth=2, netwidth=16,
    nerf_out_dim=8, N_vocab=8, appearance_wh=(32, 24), noise_std=0.0,
    chunk=4096,
)


def _setup(**over):
    cfg = Config(**CFG).replace(**over)
    system = CrNerfSystem(cfg)
    variables = system.init(jax.random.PRNGKey(0))
    return cfg, system, variables


class TestBucketSize:
    def test_quarter_octave_with_floor(self):
        assert bucket_size(100) == 4096
        assert bucket_size(4097) == 5120          # 1.25 * 4096
        assert bucket_size(8192) == 8192
        assert bucket_size(300_000) == 327_680    # 1.25 * 2^18
        assert bucket_size(320 * 240) == 81_920   # 6.7% pad, was 2^17
        # every bucket is a whole number of 128-wide fold rows, and
        # padding waste is bounded at 25%
        for n in (4096, 5000, 70_000, 76_800, 131_073, 999_999):
            p = bucket_size(n)
            assert p % 128 == 0 and p >= n and p <= 1.25 * n + 4096


class TestBucketedMatchesExact:
    @pytest.mark.parametrize("flags", [
        dict(encode_a=True, encode_c=True, use_mask=True),
        dict(encode_a=False, encode_c=False, use_mask=True,
             encode_random=False),
    ])
    def test_three_sizes_one_compile(self, flags):
        cfg, system, variables = _setup(**flags)
        scene = make_synthetic_scene(
            n_train=2, n_test=1, img_wh=(20, 16),
            appearance_wh=tuple(cfg.appearance_wh),
        )
        scene.build_ray_buffers()
        im = scene.test_images[0]
        b = full_image_batch(scene, im)

        r_exact = Renderer(cfg.replace(eval_bucket=False), variables,
                           system)
        r_buck = Renderer(cfg.replace(eval_bucket=True), variables,
                          system)

        # three distinct shapes sliced from the same ray buffer
        w0, h0 = im.wh
        rays = np.asarray(b["rays"][:, :8]).reshape(h0, w0, 8)
        for (h, w) in [(16, 20), (14, 18), (12, 16)]:
            sub = rays[:h, :w].reshape(-1, 8)
            key = jax.random.PRNGKey(3)
            oe = r_exact.render_frame(sub, b["whole_img"], (h, w), key)
            ob = r_buck.render_frame(sub, b["whole_img"], (h, w), key)
            np.testing.assert_allclose(
                ob["rgb"], oe["rgb"], atol=1e-4,
                err_msg=f"rgb mismatch at {(h, w)}",
            )
            np.testing.assert_allclose(
                ob["depth"], oe["depth"], atol=5e-4
            )
            if "mask" in oe:
                np.testing.assert_allclose(
                    ob["mask"], oe["mask"], atol=1e-4
                )
        buckets = [k for k in r_buck._cache if k[0] == "bucket"]
        assert len(buckets) == 1, buckets  # one compile for all 3 sizes


class TestU8AndPipeline:
    """The uint8-on-device output variant and async handles
    (render/inference.py _select / render_frame_async): the PNG bytes
    must match the synchronous float path's host quantization, and
    handles kept in flight must not interfere with each other."""

    def _scene_and_renderer(self, bucket=True):
        cfg, system, variables = _setup(
            encode_a=True, encode_c=True, use_mask=True,
        )
        scene = make_synthetic_scene(
            n_train=2, n_test=1, img_wh=(20, 16),
            appearance_wh=tuple(cfg.appearance_wh),
        )
        scene.build_ray_buffers()
        r = Renderer(cfg.replace(eval_bucket=bucket), variables, system)
        return scene, r

    @pytest.mark.parametrize("bucket", [True, False])
    def test_u8_matches_host_quantization(self, bucket):
        scene, r = self._scene_and_renderer(bucket)
        im = scene.test_images[0]
        b = full_image_batch(scene, im)
        w, h = im.wh
        key = jax.random.PRNGKey(5)
        full = r.render_frame(b["rays"][:, :8], b["whole_img"], (h, w),
                              key)
        host_u8 = (np.clip(full["rgb"], 0, 1) * 255).astype(np.uint8)
        dev_u8 = r.fetch(
            r.render_frame_async(b["rays"][:, :8], b["whole_img"],
                                 (h, w), key, outputs="rgb_u8")
        )["rgb_u8"]
        assert dev_u8.dtype == np.uint8 and dev_u8.shape == (h, w, 3)
        # the u8 program is a different XLA program than the full one;
        # fusion rounding may flip a truncation boundary on a handful of
        # pixels — bound it at one 8-bit level
        assert int(
            np.abs(dev_u8.astype(int) - host_u8.astype(int)).max()
        ) <= 1

    def test_inflight_handles_are_independent(self):
        """Dispatch three different sizes before fetching any (deeper
        than the apps' default pipeline): each fetch must return the
        same pixels as its own synchronous render."""
        scene, r = self._scene_and_renderer(bucket=True)
        im = scene.test_images[0]
        b = full_image_batch(scene, im)
        w0, h0 = im.wh
        rays = np.asarray(b["rays"][:, :8]).reshape(h0, w0, 8)
        sizes = [(16, 20), (14, 18), (12, 16)]
        key = jax.random.PRNGKey(7)
        handles = [
            r.render_frame_async(rays[:h, :w].reshape(-1, 8),
                                 b["whole_img"], (h, w), key,
                                 outputs="rgb_u8")
            for (h, w) in sizes
        ]
        for (h, w), hnd in zip(sizes, handles):
            got = r.fetch(hnd)["rgb_u8"]
            ref = r.fetch(
                r.render_frame_async(rays[:h, :w].reshape(-1, 8),
                                     b["whole_img"], (h, w), key,
                                     outputs="rgb_u8")
            )["rgb_u8"]
            np.testing.assert_array_equal(got, ref)

    def test_cam_rays_match_host_rays(self):
        """Camera-in dispatch (rays/uv generated on device from
        (c2w, K, near, far) — render/inference.py _fn_bucketed_cam) must
        reproduce the host-ray-buffer path pixel-for-pixel (<= 1 8-bit
        level: the two are different XLA programs; the ray math itself is
        the same core/rays.py formulas)."""
        scene, r = self._scene_and_renderer(bucket=True)
        im = scene.test_images[0]
        b = full_image_batch(scene, im)
        w, h = im.wh
        key = jax.random.PRNGKey(9)
        host_u8 = r.fetch(
            r.render_frame_async(b["rays"][:, :8], b["whole_img"],
                                 (h, w), key, outputs="rgb_u8")
        )["rgb_u8"]
        cam_u8 = r.fetch(
            r.render_frame_cam_async(
                im.c2w, im.K, im.near, im.far, (h, w),
                im.appearance[None].astype(np.float32), key,
                outputs="rgb_u8",
            )
        )["rgb_u8"]
        assert cam_u8.shape == host_u8.shape
        assert int(
            np.abs(cam_u8.astype(int) - host_u8.astype(int)).max()
        ) <= 1

    def test_cam_rays_nonbucketed_fallback(self):
        """With bucketing off the cam entry falls back to host rays and
        the exact per-resolution program."""
        scene, r = self._scene_and_renderer(bucket=False)
        im = scene.test_images[0]
        w, h = im.wh
        out = r.fetch(
            r.render_frame_cam_async(
                im.c2w, im.K, im.near, im.far, (h, w),
                im.appearance[None].astype(np.float32),
                outputs="rgb_u8",
            )
        )
        assert out["rgb_u8"].shape == (h, w, 3)
