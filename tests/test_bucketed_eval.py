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
