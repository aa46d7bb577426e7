"""The full CR-NeRF system: NeRF MLPs + appearance encoder + style
transform/decoder + transient mask net, composed into one jittable forward.

Equivalent of the reference ``NeRFSystem`` forward/decode
(/root/reference/train_mask_grid_sample.py:67-226) with the implicit state
made explicit:

- the appearance-embedding cache becomes an array in the train state (the
  reference keeps a per-rank Python list that is lost on resume —
  train…py:89,221, SURVEY.md §2.7); the *selection* of the random embedding
  happens in the train step where the cache lives.
- the transient mask is gathered at the sampled pixels by bilinear
  interpolation at their pixel centers (``sample_bilinear_uv``) instead of
  materializing a full-resolution mask and flat-indexing
  (train…py:170-176) — same values, static shapes, no full-res buffer.

Parameter tree keys mirror the reference checkpoint prefixes
(``nerf_coarse``, ``nerf_fine``, ``enc_a``, ``enc_cont``, ``decoder``,
``implicit_mask`` — SURVEY.md §2.7) so selective loading is mechanical.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from crnerf_tpu.config import Config
from crnerf_tpu.models import (
    AppearanceEncoder,
    ContextGuidedNetwork,
    NerfMLP,
    StyleNet,
    get_renderer,
)
from crnerf_tpu.models.common import resize_bilinear, sample_bilinear_uv
from crnerf_tpu.render.renderer import render_rays, render_rays_tiled


@dataclasses.dataclass(frozen=True)
class SystemModules:
    coarse: NerfMLP
    fine: Optional[NerfMLP]
    enc_a: Optional[AppearanceEncoder]
    enc_cont: Optional[AppearanceEncoder]
    decoder: Any  # StyleNet when encode_a else NeuralRenderer
    mask_net: Optional[ContextGuidedNetwork]


def build_modules(cfg: Config) -> SystemModules:
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    mk_mlp = lambda: NerfMLP(  # noqa: E731
        depth=cfg.netdepth,
        width=cfg.netwidth,
        in_channels_xyz=cfg.in_channels_xyz,
        in_channels_dir=cfg.in_channels_dir,
        out_dim=cfg.nerf_out_dim,
        compute_dtype=dt,
    )
    coarse = mk_mlp()
    fine = mk_mlp() if cfg.N_importance > 0 else None
    enc_a = (
        AppearanceEncoder(cfg.nerf_out_dim, dtype=dt, s2d=cfg.s2d_heads,
                          s2d_stack=cfg.s2d_stack)
        if cfg.encode_a else None
    )
    enc_cont = (
        AppearanceEncoder(cfg.nerf_out_dim, dtype=dt, s2d=cfg.s2d_heads,
                          s2d_stack=cfg.s2d_stack)
        if cfg.encode_c else None
    )
    if cfg.encode_a:
        decoder = StyleNet(nerf_out_dim=cfg.nerf_out_dim, dtype=dt)
    else:
        decoder = get_renderer(cfg.nerf_out_dim, cfg.model_mode)
    mask_net = (
        ContextGuidedNetwork(classes=1, M=2, N=2, input_channel=3,
                             norm=cfg.norm)
        if cfg.use_mask
        else None
    )
    return SystemModules(coarse, fine, enc_a, enc_cont, decoder, mask_net)


class CrNerfSystem:
    """Holds static module definitions + config; all methods are pure in
    (variables, inputs) and safe to jit/shard_map."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.m = build_modules(cfg)

    # ------------------------------------------------------------- init
    def init(self, key: jax.Array) -> Dict[str, Any]:
        cfg = self.cfg
        ks = jax.random.split(key, 6)
        gh = cfg.grid_hw
        wa, ha = cfg.appearance_wh
        params: Dict[str, Any] = {}
        batch_stats: Dict[str, Any] = {}

        dummy_xyz = jnp.zeros((1, cfg.in_channels_xyz))
        dummy_dir = jnp.zeros((1, cfg.in_channels_dir))
        params["nerf_coarse"] = self.m.coarse.init(ks[0], dummy_xyz, dummy_dir)[
            "params"
        ]
        if self.m.fine is not None:
            params["nerf_fine"] = self.m.fine.init(
                ks[1], dummy_xyz, dummy_dir
            )["params"]

        dummy_img = jnp.zeros((1, ha, wa, 3))
        if self.m.enc_a is not None:
            params["enc_a"] = self.m.enc_a.init(ks[2], dummy_img)["params"]
        if self.m.enc_cont is not None:
            params["enc_cont"] = self.m.enc_cont.init(ks[3], dummy_img)[
                "params"
            ]

        feat = jnp.zeros((1, gh, gh, cfg.nerf_out_dim))
        if cfg.encode_a:
            style = jnp.zeros((1, 32, 32, cfg.nerf_out_dim))
            params["decoder"] = self.m.decoder.init(ks[4], feat, style)[
                "params"
            ]
        else:
            params["decoder"] = self.m.decoder.init(ks[4], feat)["params"]

        if self.m.mask_net is not None:
            v = self.m.mask_net.init(ks[5], dummy_img, train=False)
            params["implicit_mask"] = v["params"]
            batch_stats["implicit_mask"] = v.get("batch_stats", {})

        return {"params": params, "batch_stats": batch_stats}

    # ------------------------------------------------------- apply fns
    def _apply_coarse(self, p, xyz_emb, dir_emb):
        return self.m.coarse.apply({"params": p}, xyz_emb, dir_emb)

    def _apply_fine(self, p, xyz_emb, dir_emb):
        return self.m.fine.apply({"params": p}, xyz_emb, dir_emb)

    def encode_appearance(self, params, whole01):
        """whole01: (1, Ha, Wa, 3) in [0,1] -> (1, 32, 32, C)."""
        return self.m.enc_a.apply({"params": params["enc_a"]}, whole01)

    def decode(self, params, feature_flat, hw: Tuple[int, int],
               style=None, kind: Optional[str] = None,
               valid: Optional[Tuple] = None):
        """feature_flat (B, C), B = h*w row-major -> rgb image (1,h,w,3).

        Mirrors NeRFSystem.decode (train…py:127-149). ``valid``: see
        ``forward`` — masked style statistics for bucketed (padded) maps."""
        h, w = hw
        fmap = feature_flat.reshape(1, h, w, -1)
        vmask, n_valid = valid if valid is not None else (None, None)
        if self.cfg.encode_a:
            return self.m.decoder.apply(
                {"params": params["decoder"]}, fmap, style, kind=kind,
                valid_mask=vmask, n_valid=n_valid,
            )
        return self.m.decoder.apply({"params": params["decoder"]}, fmap)

    def predict_mask(self, variables, whole01, train: bool):
        """CGNet mask over the fixed-size appearance image ->
        ((1, Ha, Wa, 1), new_batch_stats_or_None)."""
        v = {
            "params": variables["params"]["implicit_mask"],
            "batch_stats": variables["batch_stats"]["implicit_mask"],
        }
        if train and self.cfg.norm == "batch":
            mask, mutated = self.m.mask_net.apply(
                v, whole01, train=True, mutable=["batch_stats"]
            )
            # keep the submodule nesting so the train-state batch_stats tree
            # keeps its structure across steps
            new_bs = dict(variables["batch_stats"])
            new_bs["implicit_mask"] = mutated["batch_stats"]
            return mask, new_bs
        return self.m.mask_net.apply(v, whole01, train=False), None

    def _render_kw(self, train: bool) -> Dict[str, Any]:
        """render_rays keyword bundle incl. Pallas routing. Both training
        and inference default to the fused rays-in Pallas kernels — the
        measured-faster option on both paths since the rays-in rewrite
        (0.585 vs 0.777 s/frame at eval; BASELINE.md). pallas_interpret
        runs the same Pallas route through the interpreter on CPU (CI
        coverage of the TPU code path)."""
        cfg = self.cfg
        fused_opts = None
        on_tpu = jax.default_backend() == "tpu" or cfg.pallas_interpret
        if (not train and cfg.use_pallas and on_tpu) or (
            train and cfg.pallas_train and on_tpu
        ):
            bf16 = cfg.compute_dtype == "bfloat16"
            fused_opts = {
                "n_emb_dir": cfg.N_emb_dir,
                "depth": cfg.netdepth,
                "tile": 1024 if not train else 512,
                "compute_dtype": jnp.bfloat16 if bf16 else jnp.float32,
                "train": train,
                "interpret": cfg.pallas_interpret,
                # recurrence-based sin/cos only where its ~2e-4 error is
                # below the compute stream's own quantization (bf16)
                "exact_encode": not (cfg.fast_sincos and bf16),
                "full": cfg.pallas_render,
                "stash": cfg.pallas_stash and train,
                # eval-only fwd tile target (config.py eval_tile_pts:
                # 2048-pt tiles measured -8% s/frame vs the train-path
                # 4096 default; 0 = kernel default)
                "tile_pts": 0 if train else cfg.eval_tile_pts,
            }
        return dict(
            n_samples=cfg.N_samples,
            n_importance=cfg.N_importance,
            n_emb_xyz=cfg.N_emb_xyz,
            n_emb_dir=cfg.N_emb_dir,
            use_disp=cfg.use_disp,
            perturb=cfg.perturb if train else 0.0,
            noise_std=cfg.noise_std if train else 0.0,
            test_time=not train,
            pertube_cord=cfg.pertube_cord and train,
            remat=cfg.remat,
            fused_opts=fused_opts,
            pdf_impl=cfg.pdf_impl,
        )

    # ----------------------------------------------------------- forward
    def forward(
        self,
        variables: Dict[str, Any],
        batch: Dict[str, jax.Array],
        key: jax.Array,
        a_embedded_random: Optional[jax.Array] = None,
        random_has_any: Optional[jax.Array] = None,
        train: bool = True,
        tile: Optional[int] = None,
        image_hw: Optional[Tuple[int, int]] = None,
        precomputed_heads: Optional[Tuple] = None,
        valid: Optional[Tuple[jax.Array, jax.Array]] = None,
        want_content: Optional[bool] = None,
    ):
        """The cross-ray forward pass (train…py:151-226).

        batch keys: rays (B,8), ts (B,), rgbs (B,3), whole_img (1,Ha,Wa,3)
        in [-1,1], uv_pix (B,2) pixel-center coords of the sampled pixels.
        At eval, ``uv_pix`` present -> the mask is gathered at those pixel
        centers (the bucketed path); absent -> resized to ``image_hw``.

        valid: optional ``(mask (1,H,W,1) 0/1, n_valid traced count)`` for
        resolution-BUCKETED renders — rays beyond n_valid are padding; the
        style transform's global statistics are computed over the valid
        pixels only (models/style.py). Requires the pointwise n_blocks=0
        decoder.

        want_content: override for the content-constraint heads
        (enc_cont + the un-styled decode). Defaults to ``cfg.encode_c``;
        pure inference (render/inference.py) passes False — the content
        outputs only feed the training loss and the val image panels.

        a_embedded_random: the randomly-chosen cached style embedding
        (selection happens in the train step where the cache lives);
        None disables the random branch. random_has_any: traced bool — when
        False (empty cache) the live embedding is used instead, with
        gradient, matching the reference's warm-up behavior
        (train…py:163-164).

        precomputed_heads: optional ``(a_embedded (1,32,32,C) or None,
        mask_small (1,Ha,Wa,1) or None)`` computed OUTSIDE (the chunked
        train step hoists enc_a + CGNet out of its grad-accumulation
        scan, batched over all grids, and feeds them here; gradients
        reach the head params through these inputs' cotangents —
        train/step.py).

        Returns (results dict, new_batch_stats or None).
        """
        cfg = self.cfg
        params = variables["params"]
        results: Dict[str, Any] = {}
        new_bs = None
        hw = image_hw if image_hw is not None else (cfg.grid_hw, cfg.grid_hw)
        pre_a, pre_mask = (
            precomputed_heads if precomputed_heads is not None
            else (None, None)
        )

        a_embedded = None
        if cfg.encode_a:
            if pre_a is not None:
                a_embedded = pre_a
            else:
                whole01 = (batch["whole_img"] + 1.0) / 2.0  # train…py:156
                a_embedded = self.encode_appearance(params, whole01)
            results["a_embedded"] = a_embedded

        if cfg.use_mask:
            if pre_mask is not None:
                mask_small = pre_mask
            else:
                whole01_m = (batch["whole_img"] + 1.0) / 2.0
                mask_small, new_bs = self.predict_mask(
                    variables, whole01_m, train
                )
            if train or "uv_pix" in batch:
                # gather mask at sampled pixel centers (== interpolate to
                # full res then flat-index, see models/common.py); the
                # bucketed eval path supplies uv_pix for its padded rays
                out_mask = sample_bilinear_uv(mask_small[0], batch["uv_pix"])
            else:
                out_mask = resize_bilinear(mask_small, hw).reshape(-1, 1)
            results["out_mask"] = out_mask

        render_kw = self._render_kw(train)
        apply_fine = self._apply_fine if self.m.fine is not None else None
        ray_params = {
            "coarse": params["nerf_coarse"],
            "fine": params.get("nerf_fine"),
        }
        if tile is None:
            rr = render_rays(
                self._apply_coarse, apply_fine, ray_params, batch["rays"],
                key, **render_kw,
            )
        else:
            rr = render_rays_tiled(
                self._apply_coarse, apply_fine, ray_params, batch["rays"],
                key, tile=tile, **render_kw,
            )
        results.update(rr)

        # ---- decode heads (train…py:205-224)
        h, w = hw
        has_fine = cfg.N_importance > 0
        want_c = cfg.encode_c if want_content is None else (
            want_content and cfg.encode_c
        )
        vmask, n_valid = valid if valid is not None else (None, None)
        do_random = (cfg.encode_a and cfg.encode_random
                     and a_embedded_random is not None)
        if do_random and random_has_any is not None:
            a_embedded_random = jnp.where(
                random_has_any,
                a_embedded_random.astype(a_embedded.dtype),
                a_embedded,
            )

        if cfg.encode_a and has_fine:
            # ONE batched StyleTransform+decoder pass over every styled
            # map (+ the raw content map) — identical math, one launch
            # per conv instead of up to four (train-step decode long
            # tail, BASELINE.md)
            fc_map = rr["feature_coarse"].reshape(1, h, w, -1)
            ff_map = rr["feature_fine"].reshape(1, h, w, -1)
            maps = [fc_map, ff_map]
            styles = [a_embedded, a_embedded]
            if do_random:
                maps.append(ff_map)
                styles.append(a_embedded_random)
            raw = ff_map if want_c else None
            imgs = self.m.decoder.apply(
                {"params": params["decoder"]},
                jnp.concatenate(maps, 0), jnp.concatenate(styles, 0),
                raw, method="decode_batch",
                valid_mask=vmask, n_valid=n_valid,
            )
            rgb_coarse_img = imgs[0:1]
            rgb_fine_img = imgs[1:2]
            results["rgb_coarse"] = rgb_coarse_img.reshape(-1, 3)
            results["rgb_fine_img"] = rgb_fine_img
            results["rgb_fine"] = rgb_fine_img.reshape(-1, 3)
            if do_random:
                rgb_rand_img = imgs[2:3]
            if want_c:
                results["rgb_content_img"] = imgs[-1:]
        else:
            rgb_coarse_img = self.decode(
                params, rr["feature_coarse"], hw, a_embedded, valid=valid
            )
            results["rgb_coarse"] = rgb_coarse_img.reshape(-1, 3)
            if has_fine:
                rgb_fine_img = self.decode(
                    params, rr["feature_fine"], hw, a_embedded, valid=valid
                )
                results["rgb_fine_img"] = rgb_fine_img
                results["rgb_fine"] = rgb_fine_img.reshape(-1, 3)
            if want_c and has_fine:
                results["rgb_content_img"] = self.decode(
                    params, rr["feature_fine"], hw, None, kind="content"
                )
            if do_random and has_fine:
                rgb_rand_img = self.decode(
                    params, rr["feature_fine"], hw, a_embedded_random
                )

        if do_random and has_fine:
            results["a_embedded_random"] = a_embedded_random
            # re-encode the random-styled render; constrain to the chosen
            # embedding (train…py:219)
            results["a_embedded_random_rec"] = self.m.enc_a.apply(
                {"params": params["enc_a"]}, rgb_rand_img
            )
            results["rgb_fine_random"] = rgb_rand_img.reshape(-1, 3)

        if want_c and has_fine:
            # both content embeddings in one batched encoder pass
            both = self.m.enc_cont.apply(
                {"params": params["enc_cont"]},
                jnp.concatenate(
                    [results["rgb_fine_img"], results["rgb_content_img"]],
                    axis=0,
                ),
            )
            results["content_with_a_embed"] = both[0:1]
            results["content_wo_a_embed"] = both[1:2]

        return results, new_bs


def forward_eval_sharded(
    system: CrNerfSystem,
    variables: Dict[str, Any],
    batch: Dict[str, jax.Array],
    key: jax.Array,
    image_hw: Tuple[int, int],
    n_pixels: int,
    axis_name: str,
    tile: Optional[int] = None,
) -> Dict[str, jax.Array]:
    """Eval forward for FULL-IMAGE renders with rays sharded over a mesh
    axis — the TPU-native answer to "render a frame on N chips"
    (SURVEY.md §5.7): each device volume-renders its slice of the rays
    (the expensive part), the per-ray features are all-gathered over ICI
    (a few MB), and the style decode — whose MulLayer computes GLOBAL
    gram statistics over the feature map (/root/reference/models/
    linearStyleTransfer.py:58-90), so it cannot run on a shard — is
    computed replicated.

    Call INSIDE shard_map with batch["rays"] sharded on the leading axis
    (possibly padded to the mesh size; ``n_pixels`` = h*w slices the
    gathered features back). Returns replicated rgb/depth/mask results.
    """
    cfg = system.cfg
    params = variables["params"]
    results: Dict[str, Any] = {}
    hw = image_hw

    a_embedded = None
    if cfg.encode_a:
        whole01 = (batch["whole_img"] + 1.0) / 2.0
        a_embedded = system.encode_appearance(params, whole01)

    if cfg.use_mask:
        whole01_m = (batch["whole_img"] + 1.0) / 2.0
        mask_small, _ = system.predict_mask(variables, whole01_m, False)
        results["out_mask"] = resize_bilinear(mask_small, hw).reshape(-1, 1)

    apply_fine = system._apply_fine if system.m.fine is not None else None
    ray_params = {
        "coarse": params["nerf_coarse"],
        "fine": params.get("nerf_fine"),
    }
    kw = system._render_kw(train=False)
    local = render_rays_tiled if tile is not None else render_rays
    rr = local(
        system._apply_coarse, apply_fine, ray_params, batch["rays"], key,
        **(dict(tile=tile, **kw) if tile is not None else kw),
    )

    def gather(x):
        return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)[
            :n_pixels
        ]

    fmap_c = gather(rr["feature_coarse"])
    results["depth_coarse"] = gather(rr["depth_coarse"])
    results["rgb_coarse"] = system.decode(
        params, fmap_c, hw, a_embedded
    ).reshape(-1, 3)
    if cfg.N_importance > 0:
        fmap_f = gather(rr["feature_fine"])
        results["depth_fine"] = gather(rr["depth_fine"])
        results["rgb_fine"] = system.decode(
            params, fmap_f, hw, a_embedded
        ).reshape(-1, 3)
    return results
