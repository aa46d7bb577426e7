"""Phototourism (IMC-PT) scene loader -> ``Scene``.

Mirrors the reference pipeline's semantics
(/root/reference/datasets/phototourism_mask_grid_sample.py:56-212) without
its Dataset/DataLoader machinery:

- ``{scene}.tsv`` lists images + train/test split; rows with null id are
  dropped; the tsv id column is ignored (it is broken upstream — the COLMAP
  id comes from images.bin by filename, phototourism…py:64-80).
- Intrinsics from cameras.bin assuming PINHOLE-style params (fx, fy, cx,
  cy); the nominal image size is taken as (2*cx, 2*cy) and focal/center are
  rescaled by integer-floor downscale (phototourism…py:88-102).
- Poses: COLMAP w2c (qvec,tvec) inverted to c2w, then the rotation is
  re-based from "right-down-front" to "right-up-back" by negating columns
  1:3 (phototourism…py:104-118).
- Per-image near/far = 0.1 / 99.9 percentiles of the z of world points in
  front of that camera; a global scale maps max far -> 5
  (phototourism…py:131-146).
- Train images are decoded at ``img_downscale`` (LANCZOS); the appearance /
  mask input is resized to ONE fixed (Wa, Ha) in [-1, 1] (the reference uses
  variable downscale-8 images — phototourism…py:36-39,194-196; fixed shape
  keeps the train step a single XLA program, SURVEY.md §7 hard part 1).

A one-shot npz cache (built by ``crnerf_tpu.apps.prepare``) skips COLMAP
parsing + image decode on subsequent runs (reference
prepare_phototourism.py:19-60).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Optional, Tuple

import numpy as np

from crnerf_tpu.data import colmap
from crnerf_tpu.data.scene import Scene, SceneImage

APPEARANCE_DOWNSCALE_4_SCENES = ("hagia_sophia_interior", "taj_mahal")


def _load_image(path: str, downscale: int, appearance_wh: Tuple[int, int]):
    """-> (rgbs (h*w, 3) [0,1], (w, h), appearance (Ha, Wa, 3) [-1,1])."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    if downscale > 1:
        w, h = w // downscale, h // downscale
        img_rs = img.resize((w, h), Image.LANCZOS)
    else:
        img_rs = img
    rgbs = np.asarray(img_rs, np.float32).reshape(-1, 3) / 255.0
    app = img.resize(appearance_wh, Image.LANCZOS)
    app = np.asarray(app, np.float32) / 255.0 * 2.0 - 1.0
    return rgbs, (w, h), app


def _cache_path(root_dir: str, downscale: int) -> str:
    return os.path.join(root_dir, "cache_tpu", f"scene_ds{downscale}.npz")


def load_phototourism(
    root_dir: str,
    img_downscale: int = 2,
    appearance_wh: Tuple[int, int] = (224, 160),
    use_cache: bool = True,
    load_test_images: bool = True,
) -> Scene:
    cache = _cache_path(root_dir, img_downscale)
    if use_cache and os.path.exists(cache):
        return load_scene_cache(cache)

    import pandas as pd

    tsv_matches = glob.glob(os.path.join(root_dir, "*.tsv"))
    if not tsv_matches:
        raise FileNotFoundError(
            f"no <scene>.tsv split file under {root_dir!r} — is this a "
            "phototourism scene root (expects <scene>.tsv + dense/)?"
        )
    tsv = tsv_matches[0]
    scene_name = os.path.basename(tsv)[:-4]
    files = pd.read_csv(tsv, sep="\t")
    files = files[~files["id"].isnull()].reset_index(drop=True)

    imdata = colmap.read_images_binary(
        os.path.join(root_dir, "dense/sparse/images.bin")
    )
    camdata = colmap.read_cameras_binary(
        os.path.join(root_dir, "dense/sparse/cameras.bin")
    )
    pts3d = colmap.read_points3d_binary(
        os.path.join(root_dir, "dense/sparse/points3D.bin")
    )

    name_to_id = {v.name: k for k, v in imdata.items()}
    rows = []  # (colmap_id, filename, split)
    for i in range(len(files)):
        fn = files.loc[i, "filename"]
        if fn in name_to_id:
            rows.append((name_to_id[fn], fn, files.loc[i, "split"]))

    # ---- intrinsics at downscale
    Ks: Dict[int, np.ndarray] = {}
    whs: Dict[int, Tuple[int, int]] = {}
    for id_, _, _ in rows:
        cam = camdata[id_]
        fx, fy, cx, cy = cam.params[:4]
        w0, h0 = int(cx * 2), int(cy * 2)
        w_, h_ = w0 // img_downscale, h0 // img_downscale
        K = np.array(
            [
                [fx * w_ / w0, 0, cx * w_ / w0],
                [0, fy * h_ / h0, cy * h_ / h0],
                [0, 0, 1],
            ],
            np.float32,
        )
        Ks[id_] = K
        whs[id_] = (w_, h_)

    # ---- poses + near/far + global scale
    w2c = {}
    for id_, _, _ in rows:
        im = imdata[id_]
        R = colmap.qvec2rotmat(im.qvec)
        t = im.tvec.reshape(3, 1)
        m = np.eye(4)
        m[:3, :3] = R
        m[:3, 3:] = t
        w2c[id_] = m
    xyz_world = np.stack([p.xyz for p in pts3d.values()], 0)
    xyz_h = np.concatenate(
        [xyz_world, np.ones((len(xyz_world), 1))], -1
    )

    c2w: Dict[int, np.ndarray] = {}
    nears: Dict[int, float] = {}
    fars: Dict[int, float] = {}
    for id_, _, _ in rows:
        cam_pts = (xyz_h @ w2c[id_].T)[:, :3]
        z = cam_pts[cam_pts[:, 2] > 0, 2]
        nears[id_] = float(np.percentile(z, 0.1))
        fars[id_] = float(np.percentile(z, 99.9))
        inv = np.linalg.inv(w2c[id_])[:3]
        inv[:, 1:3] *= -1  # right-down-front -> right-up-back
        c2w[id_] = inv.astype(np.float32)

    scale = max(fars.values()) / 5.0
    for id_, _, _ in rows:
        c2w[id_][:, 3] /= scale
        nears[id_] /= scale
        fars[id_] /= scale

    # ---- decode images
    images = []
    for id_, fn, split in rows:
        want_pixels = split == "train" or load_test_images
        rgbs, wh, app = (None, whs[id_], None)
        if want_pixels:
            rgbs, wh, app = _load_image(
                os.path.join(root_dir, "dense/images", fn),
                img_downscale,
                appearance_wh,
            )
        images.append(
            SceneImage(
                id=id_,
                name=fn,
                K=Ks[id_],
                c2w=c2w[id_],
                near=nears[id_],
                far=fars[id_],
                wh=wh,
                rgbs=rgbs,
                appearance=app,
                split=split,
            )
        )
    return Scene(
        name=scene_name,
        images=images,
        white_back=False,
        appearance_wh=appearance_wh,
    )


# --------------------------------------------------------------- caching
def save_scene_cache(scene: Scene, path: Optional[str] = None,
                     root_dir: Optional[str] = None,
                     img_downscale: int = 2) -> str:
    """Serialize a fully-loaded Scene to one npz (the TPU build's version of
    the reference's 10 pickle/npy cache artifacts,
    prepare_phototourism.py:26-58)."""
    if path is None:
        path = _cache_path(root_dir, img_downscale)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    n = len(scene.images)
    meta = dict(
        scene_name=scene.name,
        appearance_wh=np.asarray(scene.appearance_wh, np.int64),
        ids=np.asarray([im.id for im in scene.images], np.int64),
        names=np.asarray([im.name for im in scene.images]),
        Ks=np.stack([im.K for im in scene.images], 0),
        c2ws=np.stack([im.c2w for im in scene.images], 0),
        nears=np.asarray([im.near for im in scene.images], np.float32),
        fars=np.asarray([im.far for im in scene.images], np.float32),
        whs=np.asarray([im.wh for im in scene.images], np.int64),
        splits=np.asarray([im.split for im in scene.images]),
        has_pixels=np.asarray(
            [im.rgbs is not None for im in scene.images], bool
        ),
    )
    arrays = {}
    for i, im in enumerate(scene.images):
        if im.rgbs is not None:
            arrays[f"rgbs_{i}"] = im.rgbs.astype(np.float32)
            arrays[f"app_{i}"] = im.appearance.astype(np.float32)
    np.savez_compressed(path, **meta, **arrays)
    return path


def load_scene_cache(path: str) -> Scene:
    z = np.load(path, allow_pickle=False)
    n = len(z["ids"])
    images = []
    for i in range(n):
        has_px = bool(z["has_pixels"][i])
        images.append(
            SceneImage(
                id=int(z["ids"][i]),
                name=str(z["names"][i]),
                K=z["Ks"][i],
                c2w=z["c2ws"][i],
                near=float(z["nears"][i]),
                far=float(z["fars"][i]),
                wh=(int(z["whs"][i][0]), int(z["whs"][i][1])),
                rgbs=z[f"rgbs_{i}"] if has_px else None,
                appearance=z[f"app_{i}"] if has_px else None,
                split=str(z["splits"][i]),
            )
        )
    return Scene(
        name=str(z["scene_name"]),
        images=images,
        white_back=False,
        appearance_wh=(
            int(z["appearance_wh"][0]),
            int(z["appearance_wh"][1]),
        ),
    )
