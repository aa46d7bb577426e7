"""The jitted volumetric renderer.

Equivalent of the reference's ``render_rays_cross_ray``
(/root/reference/models/rendering.py:50-196) redesigned for XLA: the whole
coarse -> resample -> fine pipeline is one fixed-shape program. The
reference's two nested Python chunking loops (train…py:184-197,
rendering.py:110-114) are replaced by ``lax.map`` over fixed ray tiles
(``render_rays_tiled``) — chunking exists purely as an HBM-footprint knob,
not a host loop.

Randomness is explicit: one key in, split into z-perturb / sigma-noise /
PDF-draw / coord-perturb streams.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from crnerf_tpu.core.compositing import composite, composite_packed
from crnerf_tpu.core.encoding import posenc
from crnerf_tpu.core.sampling import (
    merge_sorted_zvals,
    perturb_zvals,
    sample_pdf,
    stratified_zvals,
)


def _eval_mlp(apply_fn, params, xyz, dir_emb, n_emb_xyz, remat,
              pertube_key=None, fused=None):
    """Evaluate a NeRF MLP on (N, S, 3) points with per-ray (N, D) dir
    embeddings.

    Returns features (N, S, C) and sigmas (N, S) on the flax path; on the
    ``fused`` path (Pallas PE+MLP kernel, crnerf_tpu.ops.fused_mlp) it
    returns the RAW packed (N, S, c_pad) lane block — features in
    cols [:C], sigma in col C — for ``composite_packed`` to consume
    without minor-dim slice round-trips.

    ``fused``: dict {'raw_dirs': (N,3) per-RAY dirs, 'n_emb_dir': int,
    'train': bool, ...}. The dir sin/cos sweep runs per ray (dir_rep=S),
    activations stay in VMEM across all 11 layers, and in training the
    backward routes through the Pallas weight-grad kernel.
    """
    n, s, _ = xyz.shape
    if pertube_key is not None:
        # reference --pertubeCord: tiny uniform jitter on the flat coords
        # (rendering.py:102-104)
        xyz = xyz + 1e-5 * jax.random.uniform(pertube_key, xyz.shape,
                                              xyz.dtype)

    if fused is not None:
        from crnerf_tpu.ops.fused_mlp import (
            fused_mlp_apply,
            make_fused_mlp_train,
            mlp_params_from_flax,
        )

        kp = mlp_params_from_flax(params, depth=fused.get("depth", 8))
        kw = dict(
            tile=fused.get("tile", 1024),
            compute_dtype=fused.get("compute_dtype", jnp.float32),
            interpret=fused.get("interpret", False),
            dir_rep=s,
            exact_encode=fused.get("exact_encode", True),
            packed=True,
        )
        if fused.get("train"):
            # differentiable path: Pallas fwd + Pallas weight-grad bwd.
            # stop_gradient prunes the (all-zero) data-cotangent flow at
            # trace time — otherwise XLA materializes zero grads for 3M+
            # points and runs the whole ray-gen/encode backward on them.
            apply_train = make_fused_mlp_train(
                n_emb_xyz, fused["n_emb_dir"], **kw
            )
            out = apply_train(
                kp,
                jax.lax.stop_gradient(xyz.reshape(n * s, 3)),
                jax.lax.stop_gradient(fused["raw_dirs"]),
            )
        else:
            out = fused_mlp_apply(
                kp, xyz.reshape(n * s, 3), fused["raw_dirs"],
                n_emb_xyz=n_emb_xyz,
                n_emb_dir=fused["n_emb_dir"],
                **kw,
            )
        return out.reshape(n, s, -1)  # packed lane block

    def run(xyz_in):
        xyz_emb = posenc(xyz_in, n_emb_xyz)  # (N, S, 93)
        d = jnp.broadcast_to(dir_emb[:, None, :], (n, s, dir_emb.shape[-1]))
        return apply_fn(params, xyz_emb, d)

    if remat:
        run = jax.checkpoint(run)
    out = run(xyz)  # (N, S, C+1)
    return out[..., :-1], out[..., -1]


def _full_fused_eval(flax_params, xyz, rays_d, z_vals, noise_std,
                     kn, n_emb_xyz, fused, pertube_key=None):
    """One-kernel render of a pass: PE+MLP+compositing fused
    (crnerf_tpu.ops.fused_render). Returns (ray_block (N, c_pad) —
    feature_map in [:C], depth at col C — and weights (N, S)).

    The sigma noise (reference rendering.py:125-126) is drawn OUTSIDE and
    fed to the kernel so train/eval share one kernel body."""
    from crnerf_tpu.ops.fused_mlp import mlp_params_from_flax
    from crnerf_tpu.ops.fused_render import (
        fused_render_apply,
        make_fused_render_train,
    )

    n, s, _ = xyz.shape
    # rays-in mode: xyz AND the encode are computed inside the kernel
    # from per-ray origins/dirs/z — no per-point streams. The explicit
    # xyz path remains for --pertubeCord's coordinate jitter.
    rays_in = pertube_key is None and "raw_origins" in fused
    if pertube_key is not None:
        xyz = xyz + 1e-5 * jax.random.uniform(pertube_key, xyz.shape,
                                              xyz.dtype)
    pos = fused["raw_origins"] if rays_in else xyz
    kp = mlp_params_from_flax(flax_params, depth=fused.get("depth", 8))
    if noise_std > 0 and kn is not None:
        noise = noise_std * jax.random.normal(kn, (n, s), jnp.float32)
    else:
        noise = jnp.zeros((n, s), jnp.float32)
    kw = dict(
        compute_dtype=fused.get("compute_dtype", jnp.float32),
        interpret=fused.get("interpret", False),
        exact_encode=fused.get("exact_encode", True),
        rays_in=rays_in,
    )
    if fused.get("train"):
        fn = make_fused_render_train(
            n_emb_xyz, fused["n_emb_dir"], s=s,
            stash=bool(fused.get("stash", False)) and rays_in, **kw
        )
        sg = jax.lax.stop_gradient
        return fn(kp, sg(pos), sg(fused["raw_dirs"]), sg(z_vals),
                  sg(noise))
    # Inference-only tile target (config.py eval_tile_pts): the forward
    # alone pipelines best at 2048-pt tiles (-8% s/frame measured) while
    # training's fwd+stash-bwd pair picks 4096. The env sweep knob
    # (CRNERF_FWD_TILE_PTS, read inside the kernel wrapper when
    # r_tile=0) keeps precedence for A/Bs.
    import os as _os

    from crnerf_tpu.ops.fused_render import _pow2_floor

    r_tile = 0
    pts = int(fused.get("tile_pts") or 0)
    if pts > 0 and "CRNERF_FWD_TILE_PTS" not in _os.environ:
        r_tile = _pow2_floor(max(8, pts // s))
    return fused_render_apply(
        kp, pos, fused["raw_dirs"], z_vals, noise, r_tile=r_tile,
        n_emb_xyz=n_emb_xyz, n_emb_dir=fused["n_emb_dir"], **kw,
    )


def render_rays(
    apply_coarse: Callable,
    apply_fine: Optional[Callable],
    params: Dict[str, Any],
    rays: jax.Array,          # (N, 8): o, d, near, far
    key: jax.Array,
    *,
    n_samples: int = 64,
    n_importance: int = 64,
    n_emb_xyz: int = 15,
    n_emb_dir: int = 4,
    use_disp: bool = False,
    perturb: float = 1.0,
    noise_std: float = 1.0,
    test_time: bool = False,
    pertube_cord: bool = False,
    remat: bool = True,
    fused_opts: Optional[Dict[str, Any]] = None,
    pdf_impl: str = "onehot",
) -> Dict[str, jax.Array]:
    """Returns {feature_coarse, depth_coarse, weights_coarse, and (if
    n_importance>0) feature_fine, depth_fine, weights_fine, z_fine}.

    ``feature_fine`` doubles as the random-appearance branch's features — the
    reference aliases feature_fine_random = feature_fine
    (rendering.py:140-141); the decoder applies the different style.
    """
    kz, kn_c, kn_f, kpdf, kp_c, kp_f = jax.random.split(key, 6)

    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    fused = None
    if fused_opts is not None:
        fused = dict(fused_opts)
        fused.setdefault("n_emb_dir", n_emb_dir)
        fused["raw_dirs"] = rays_d
        fused["raw_origins"] = rays_o
        dir_emb = None  # the fused path encodes raw dirs per ray itself
    else:
        dir_emb = posenc(rays_d, n_emb_dir)

    def run_composite(p, out, z, noise, kn):
        """Dispatch on _eval_mlp's return convention (packed lane block on
        the fused path, (features, sigmas) on the flax path)."""
        if fused is not None:
            c_out = p["feature"]["kernel"].shape[-1]
            return composite_packed(out, c_out, z, noise, kn)
        feats, sigmas = out
        return composite(feats, sigmas, z, noise, kn)

    z_vals = stratified_zvals(near, far, n_samples, use_disp)
    if perturb > 0 and not test_time:
        z_vals = perturb_zvals(kz, z_vals, perturb)

    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    noise = 0.0 if test_time else noise_std
    full = fused is not None and fused.get("full")

    def run_pass(p, xyz_in, z, kn, kp):
        """One MLP+composite pass -> (weights, feature_map, depth)."""
        if full:
            blk, w = _full_fused_eval(
                p, xyz_in, rays_d, z, noise, kn, n_emb_xyz, fused,
                kp if pertube_cord else None,
            )
            c_out = p["feature"]["kernel"].shape[-1]
            return w, blk[:, :c_out], blk[:, c_out]
        out = _eval_mlp(
            apply_coarse if p is params["coarse"] else apply_fine,
            p, xyz_in, dir_emb, n_emb_xyz, remat,
            kp if pertube_cord else None, fused=fused,
        )
        return run_composite(p, out, z, noise, kn)

    w_c, fmap_c, depth_c = run_pass(
        params["coarse"], xyz, z_vals,
        kn_c if noise > 0 else None, kp_c,
    )
    results = {
        "weights_coarse": w_c,
        "feature_coarse": fmap_c,
        "depth_coarse": depth_c,
    }
    if n_importance <= 0 or apply_fine is None:
        return results

    z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
    # maskreduce needs ascending bins — guaranteed on exactly the same
    # condition as merge_sorted_zvals' fast path (perturb <= 1)
    impl = pdf_impl if (perturb <= 1.0 or test_time) else "onehot"
    z_fine = sample_pdf(
        kpdf, z_mid, jax.lax.stop_gradient(w_c[:, 1:-1]),
        n_importance, det=(perturb == 0) or test_time, impl=impl,
    )
    z_all = merge_sorted_zvals(z_vals, z_fine, inputs_sorted=perturb <= 1.0)
    xyz_f = rays_o[:, None, :] + rays_d[:, None, :] * z_all[..., None]
    w_f, fmap_f, depth_f = run_pass(
        params["fine"], xyz_f, z_all,
        kn_f if noise > 0 else None, kp_f,
    )
    results.update(
        weights_fine=w_f, feature_fine=fmap_f, depth_fine=depth_f
    )
    return results


def render_rays_tiled(
    apply_coarse,
    apply_fine,
    params,
    rays: jax.Array,
    key: jax.Array,
    *,
    tile: int = 2048,
    **kw,
) -> Dict[str, jax.Array]:
    """Memory-bounded render of many rays inside ONE jit: pad to a multiple
    of ``tile`` and ``lax.map`` the per-tile renderer. This replaces the
    reference's host-side chunk loops — no host sync, no cat, XLA pipelines
    tiles back-to-back.
    """
    n = rays.shape[0]
    n_pad = -(-n // tile) * tile
    rays_p = jnp.pad(rays, ((0, n_pad - n), (0, 0)))
    # one independent key per tile so noise streams don't repeat
    keys = jax.random.split(key, n_pad // tile)
    tiles = rays_p.reshape(n_pad // tile, tile, rays.shape[-1])

    def one(args):
        r, k = args
        return render_rays(apply_coarse, apply_fine, params, r, k, **kw)

    out = jax.lax.map(one, (tiles, keys))
    return {k: v.reshape(-1, *v.shape[2:])[:n] for k, v in out.items()}
