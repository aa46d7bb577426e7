"""Data-layer tests: grid sampler, synthetic scene, pipeline, COLMAP
round-trip, phototourism loader on a generated fixture, blender
perturbations."""

import json
import os

import numpy as np
import pytest

from crnerf_tpu.data import (
    GridSampler,
    Scene,
    TrainPipeline,
    grid_sample_indices,
    make_synthetic_scene,
)
from crnerf_tpu.data import colmap
from crnerf_tpu.data.pipeline import full_image_batch


class TestGridSampler:
    def test_indices_in_bounds_and_grid_shaped(self):
        rng = np.random.RandomState(0)
        flat, uv, uv_pix = grid_sample_indices(rng, (40, 30), 64, 0.5)
        assert flat.shape == (64,)
        assert flat.min() >= 0 and flat.max() < 40 * 30
        # rows vary slowest: consecutive groups of 8 share a row
        rows = flat // 40
        assert (rows.reshape(8, 8) == rows.reshape(8, 8)[:, :1]).all()
        assert uv.shape == (64, 2) and uv_pix.shape == (64, 2)
        assert (uv_pix >= 0).all() and (uv_pix <= 1).all()

    def test_deterministic_given_seed(self):
        s = GridSampler(
            n_images=3,
            image_whs=np.array([[40, 30]] * 3),
            offsets=np.array([0, 1200, 2400, 3600]),
            batch_size=64,
        )
        a = s.sample(2, 5)
        b = s.sample(2, 5)
        np.testing.assert_array_equal(a["ray_idx"], b["ray_idx"])
        assert a["image_idx"] == b["image_idx"]
        c = s.sample(2, 6)
        assert not np.array_equal(a["ray_idx"], c["ray_idx"])

    def test_offsets_applied(self):
        s = GridSampler(
            n_images=2,
            image_whs=np.array([[10, 10], [10, 10]]),
            offsets=np.array([0, 100, 200]),
            batch_size=4,
        )
        for i in range(20):
            r = s.sample(0, i)
            lo = s.offsets[r["image_idx"]]
            hi = s.offsets[r["image_idx"] + 1]
            assert (r["ray_idx"] >= lo).all() and (r["ray_idx"] < hi).all()

    def test_scale_anneal_shrinks(self):
        from crnerf_tpu.data.sampler import min_scale_cur

        assert min_scale_cur(0, 0.0025, 0.5) == pytest.approx(0.9)
        assert min_scale_cur(10**6, 0.0025, 0.5) == pytest.approx(0.5)


class TestSyntheticScene:
    def test_shapes_and_ranges(self):
        sc = make_synthetic_scene(n_train=3, n_test=1, img_wh=(32, 24))
        assert len(sc.train_images) == 3 and len(sc.test_images) == 1
        im = sc.train_images[0]
        assert im.rgbs.shape == (32 * 24, 3)
        assert im.rgbs.min() >= 0 and im.rgbs.max() <= 1
        assert im.appearance.min() >= -1 and im.appearance.max() <= 1

    def test_ray_buffers(self):
        sc = make_synthetic_scene(n_train=3, n_test=1, img_wh=(32, 24))
        sc.build_ray_buffers()
        assert sc.all_rays.shape == (3 * 32 * 24, 9)
        assert sc.all_rgbs.shape == (3 * 32 * 24, 3)
        # ts column holds image ids
        assert set(np.unique(sc.all_rays[:, 8])) == {0.0, 1.0, 2.0}
        # dirs unit-normalized
        np.testing.assert_allclose(
            np.linalg.norm(sc.all_rays[:, 3:6], axis=1), 1.0, atol=1e-5
        )

    def test_occluders_differ(self):
        a = make_synthetic_scene(occluders=False, seed=1)
        b = make_synthetic_scene(occluders=True, seed=1)
        assert not np.allclose(
            a.train_images[0].rgbs, b.train_images[0].rgbs
        )


class TestPipeline:
    def test_batch_consistency(self):
        sc = make_synthetic_scene(img_wh=(32, 24))
        pipe = TrainPipeline(sc, batch_size=64)
        b = pipe.make_batch(1, 3)
        # rays/rgbs correspond: re-gather from the buffers
        s = pipe.sampler.sample(1, 3)
        np.testing.assert_array_equal(
            b["rgbs"], sc.all_rgbs[s["ray_idx"]]
        )
        assert (b["ts"] == b["ts"][0]).all()  # single image per grid

    def test_global_batch_stacks_distinct(self):
        sc = make_synthetic_scene(img_wh=(32, 24))
        pipe = TrainPipeline(sc, batch_size=64)
        g = pipe.make_global_batch(0, 0, 4)
        assert g["rays"].shape == (4, 64, 8)
        assert not np.allclose(g["rays"][0], g["rays"][1])

    def test_epoch_batches_prefetch(self):
        sc = make_synthetic_scene(img_wh=(32, 24))
        pipe = TrainPipeline(sc, batch_size=64)
        got = list(pipe.epoch_batches(0, n_devices=2, n_steps=3))
        assert len(got) == 3
        assert got[0]["rays"].shape == (2, 64, 8)

    def test_full_image_batch(self):
        sc = make_synthetic_scene(img_wh=(32, 24))
        b = full_image_batch(sc, sc.test_images[0])
        assert b["rays"].shape == (32 * 24, 8)
        assert b["whole_img"].shape[0] == 1


class TestColmapRoundtrip:
    def test_binary_roundtrip(self, tmp_path):
        cams = {
            1: colmap.Camera(1, "PINHOLE", 64, 48,
                             np.array([50.0, 50.0, 32.0, 24.0]))
        }
        q = np.array([0.9, 0.1, 0.2, 0.05])
        q = q / np.linalg.norm(q)
        ims = {
            7: colmap.Image(
                7, q, np.array([0.1, 0.2, 0.3]), 1, "img_007.jpg",
                np.array([[1.0, 2.0]]), np.array([11], np.int64),
            )
        }
        pts = {
            11: colmap.Point3D(
                11, np.array([0.5, 0.5, 2.0]),
                np.array([200, 100, 50]), 0.3,
                np.array([7], np.int64), np.array([0], np.int64),
            )
        }
        colmap.write_cameras_binary(cams, str(tmp_path / "cameras.bin"))
        colmap.write_images_binary(ims, str(tmp_path / "images.bin"))
        colmap.write_points3d_binary(pts, str(tmp_path / "points3D.bin"))

        c2 = colmap.read_cameras_binary(str(tmp_path / "cameras.bin"))
        i2 = colmap.read_images_binary(str(tmp_path / "images.bin"))
        p2 = colmap.read_points3d_binary(str(tmp_path / "points3D.bin"))
        np.testing.assert_allclose(c2[1].params, cams[1].params)
        np.testing.assert_allclose(i2[7].qvec, q)
        assert i2[7].name == "img_007.jpg"
        np.testing.assert_allclose(p2[11].xyz, pts[11].xyz)

    def test_qvec_rotmat_inverse(self):
        rng = np.random.RandomState(3)
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = colmap.qvec2rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(colmap.rotmat2qvec(R), q, atol=1e-8)


def _write_phototourism_fixture(root):
    """Tiny on-disk phototourism scene: COLMAP binaries + tsv + images."""
    from PIL import Image as PILImage

    os.makedirs(os.path.join(root, "dense/sparse"), exist_ok=True)
    os.makedirs(os.path.join(root, "dense/images"), exist_ok=True)
    w0, h0 = 64, 48
    fx = fy = 60.0
    cams, ims = {}, {}
    rng = np.random.RandomState(0)
    names, splits = [], []
    for i in range(4):
        cam_id = i + 1
        cams[cam_id] = colmap.Camera(
            cam_id, "PINHOLE",
            w0, h0, np.array([fx, fy, w0 / 2, h0 / 2]),
        )
        theta = i * 0.5
        q = np.array([np.cos(theta / 2), 0, np.sin(theta / 2), 0])
        t = np.array([0.0, 0.0, 4.0 + 0.1 * i])
        name = f"img_{i:03d}.jpg"
        names.append(name)
        splits.append("train" if i < 3 else "test")
        ims[cam_id] = colmap.Image(
            cam_id, q, t, cam_id, name,
            np.zeros((0, 2)), np.zeros(0, np.int64),
        )
        arr = (rng.uniform(0, 255, (h0, w0, 3))).astype(np.uint8)
        PILImage.fromarray(arr).save(
            os.path.join(root, "dense/images", name)
        )
    pts = {}
    for pid in range(30):
        pts[pid] = colmap.Point3D(
            pid, rng.uniform(-1, 1, 3) + np.array([0, 0, 1.0]),
            np.array([128, 128, 128]), 0.5,
            np.array([1], np.int64), np.array([0], np.int64),
        )
    colmap.write_cameras_binary(
        cams, os.path.join(root, "dense/sparse/cameras.bin")
    )
    colmap.write_images_binary(
        ims, os.path.join(root, "dense/sparse/images.bin")
    )
    colmap.write_points3d_binary(
        pts, os.path.join(root, "dense/sparse/points3D.bin")
    )
    with open(os.path.join(root, "scene.tsv"), "w") as f:
        f.write("filename\tid\tsplit\tdataset\n")
        for i, (n, s) in enumerate(zip(names, splits)):
            f.write(f"{n}\t{i}\t{s}\tscene\n")


class TestPhototourism:
    def test_load_and_cache(self, tmp_path):
        from crnerf_tpu.data.phototourism import (
            load_phototourism,
            save_scene_cache,
            load_scene_cache,
        )

        root = str(tmp_path / "scene")
        _write_phototourism_fixture(root)
        sc = load_phototourism(
            root, img_downscale=2, appearance_wh=(32, 24), use_cache=False
        )
        assert len(sc.train_images) == 3 and len(sc.test_images) == 1
        # scale-to-5: the largest far is exactly 5
        assert max(im.far for im in sc.images) == pytest.approx(5.0, rel=1e-5)
        im = sc.train_images[0]
        assert im.wh == (32, 24)
        assert im.rgbs.shape == (32 * 24, 3)
        # poses are right-up-back: c2w R orthonormal
        np.testing.assert_allclose(
            im.c2w[:, :3] @ im.c2w[:, :3].T, np.eye(3), atol=1e-5
        )

        path = save_scene_cache(sc, root_dir=root, img_downscale=2)
        sc2 = load_scene_cache(path)
        np.testing.assert_allclose(
            sc2.train_images[0].rgbs, im.rgbs, atol=1e-7
        )
        # and load_phototourism picks the cache up
        sc3 = load_phototourism(root, img_downscale=2, use_cache=True)
        assert sc3.train_images[0].wh == (32, 24)


class TestBlender:
    def test_load_with_perturbations(self, tmp_path):
        from PIL import Image as PILImage

        from crnerf_tpu.data.blender import load_blender

        root = str(tmp_path / "lego")
        os.makedirs(root, exist_ok=True)
        frames = []
        rng = np.random.RandomState(0)
        for t in range(3):
            name = f"r_{t}"
            arr = np.zeros((800, 800, 4), np.uint8)
            arr[..., :3] = rng.randint(0, 255, (800, 800, 3))
            arr[..., 3] = 255
            PILImage.fromarray(arr, "RGBA").save(
                os.path.join(root, name + ".png")
            )
            pose = np.eye(4)
            pose[2, 3] = 4.0
            frames.append(
                {"file_path": name, "transform_matrix": pose.tolist()}
            )
        with open(os.path.join(root, "transforms_train.json"), "w") as f:
            json.dump(
                {"camera_angle_x": 0.6911, "frames": frames}, f
            )

        sc = load_blender(
            root, split="train", img_wh=(64, 64),
            perturbation=("color", "occ"), appearance_wh=(32, 24),
        )
        assert len(sc.train_images) == 3
        assert sc.white_back
        assert sc.train_images[0].near == 2.0
        assert sc.train_images[0].wh == (64, 64)

    def test_perturbation_frame0_untouched(self):
        from crnerf_tpu.data.blender import add_perturbation

        img = np.random.RandomState(0).uniform(
            0, 1, (800, 800, 3)
        ).astype(np.float32)
        out1 = add_perturbation(img, ("color",), 5)
        out2 = add_perturbation(img, ("color",), 5)
        np.testing.assert_array_equal(out1, out2)  # seeded
        assert not np.allclose(out1, img)
        occ = add_perturbation(img, ("occ",), 3)
        assert not np.allclose(occ, img)


class TestPfm:
    def test_roundtrip_gray_and_color(self, tmp_path):
        from crnerf_tpu.data.pfm import read_pfm, save_pfm

        rng = np.random.RandomState(0)
        gray = rng.uniform(0, 10, (12, 9)).astype(np.float32)
        save_pfm(str(tmp_path / "g.pfm"), gray)
        back, scale = read_pfm(str(tmp_path / "g.pfm"))
        np.testing.assert_array_equal(back, gray)

        color = rng.uniform(0, 1, (7, 5, 3)).astype(np.float32)
        save_pfm(str(tmp_path / "c.pfm"), color, scale=2.0)
        back, scale = read_pfm(str(tmp_path / "c.pfm"))
        np.testing.assert_array_equal(back, color)
        assert scale == 2.0
