#!/usr/bin/env python
"""System-level convergence parity vs the ACTUAL reference trainer.

Module-level parity (tests/test_parity.py) proves each block's math; this
harness proves the *composed system* — losses + annealing + BN-on-batch-1
dynamics + grid sampling + per-epoch cosine schedule + Adam — converges
like the reference. It drives the reference ``NeRFSystem.training_step``
math (torch CPU: render_rays_cross_ray + decode + CRNeRFLoss + Adam/cosine,
/root/reference/train_mask_grid_sample.py:268-337) and the crnerf_tpu
trainer on IDENTICAL batches from IDENTICAL initial weights (ported with
crnerf_tpu.utils.torch_port) and compares loss-term + PSNR trajectories.

Determinism: perturb=0 (-> sample_pdf det, rendering.py:185), noise_std=0.
Everything else is the full composed model: encode_a + encode_c + use_mask
(nerf_out_dim=64 — the only width at which the reference style_net can run
forward, linearStyleTransfer.py:46-47).

``--encode_random`` additionally drives the paper's signature branch — the
random-appearance decode + re-encode constraint and the embedding-cache
feedback loop (train…py:161-166,216-221). The reference's pick is an
unseedable ``random.choice`` over the filled cache entries, so both
trainers are fed the SAME pre-drawn index sequence (the valid-set evolution
is deterministic given the shared ts stream — ``draw_random_selections``);
the torch side consumes it directly, the jax side via a harness-local
override of ``_select_random_embedding`` that indexes the sequence by
``state.step``. Cache VALUES still come from each trainer's own past
steps, so this proves the full feedback dynamics, not just one step.

Usage:
    python scripts/convergence_parity.py --epochs 3 --steps_per_epoch 40
    python scripts/convergence_parity.py --encode_random --epochs 3
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
import types
from typing import Dict, List, Optional

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


# --------------------------------------------------------------- ref shims
def install_reference(torch):
    """Make /root/reference importable (kornia is not in this image — stub
    the two entry points its model code touches, with kornia's documented
    semantics; same shim as tests/test_parity.py)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "kornia" in sys.modules:
        return

    k = types.ModuleType("kornia")

    def filter2d(x, kernel, border_type="reflect", normalized=False):
        b, c, h, w = x.shape
        kk = kernel[0]
        if normalized:
            kk = kk / kk.sum()
        kh, kw = kk.shape
        pad = (kw // 2, kw // 2, kh // 2, kh // 2)
        xp = torch.nn.functional.pad(x, pad, mode="reflect")
        weight = kk.expand(c, 1, kh, kw)
        return torch.nn.functional.conv2d(xp, weight, groups=c)

    k.filter2d = filter2d
    k.__path__ = []
    filters = types.ModuleType("kornia.filters")
    filters.filter2d = filter2d
    k.filters = filters
    utils = types.ModuleType("kornia.utils")
    k.utils = utils
    sys.modules["kornia"] = k
    sys.modules["kornia.filters"] = filters
    sys.modules["kornia.utils"] = utils


# ------------------------------------------------------------------ config
def build_cfg(epochs: int, encode_random: bool = False):
    from crnerf_tpu.config import Config

    return Config(
        batch_size=64, N_samples=8, N_importance=8,
        netdepth=2, netwidth=32, nerf_out_dim=64,
        N_vocab=8, appearance_wh=(32, 24),
        encode_a=True, encode_c=True, use_mask=True,
        encode_random=encode_random,
        perturb=0.0, noise_std=0.0,
        optimizer="adam", lr=5e-4, lr_scheduler="cosine",
        num_epochs=epochs,
        compute_dtype="float32", use_pallas=False, pallas_train=False,
        chunk=16384,
    )


def make_data(cfg, seed=0):
    from crnerf_tpu.data import TrainPipeline, make_synthetic_scene

    scene = make_synthetic_scene(
        n_train=4, n_test=1, img_wh=(24, 24),
        appearance_wh=tuple(cfg.appearance_wh), seed=seed,
    )
    scene.build_ray_buffers()
    pipe = TrainPipeline(scene, batch_size=cfg.batch_size, seed_salt=seed)
    return scene, pipe


def batches_for(pipe, epochs: int, steps_per_epoch: int):
    """Materialize the shared batch stream, each with the reference-side
    extras (pixel_idx for the mask flat-index, img h/w)."""
    out = []
    for e in range(epochs):
        for i in range(steps_per_epoch):
            b = pipe.make_batch(e, i)
            s = pipe.sampler.sample(e, i)
            w, h = pipe.image_whs[s["image_idx"]]
            b = dict(b)
            b["pixel_idx"] = s["pixel_idx"]
            b["img_wh"] = (int(w), int(h))
            out.append(b)
    return out


def draw_random_selections(batches, n_vocab: int, seed: int = 11):
    """Pre-draw the random-appearance pick for every step: the reference
    chooses uniformly among filled cache entries (train…py:161-166) and
    writes ts[0] after each forward (train…py:221) — given the shared ts
    stream the valid-set evolution is deterministic, so one host-side draw
    serves both trainers. -1 == cache empty (use the live embedding)."""
    rng = np.random.RandomState(seed)
    valid: list = []
    out = []
    for b in batches:
        out.append(int(rng.choice(valid)) if valid else -1)
        t = int(b["ts"][0])
        if t not in valid:
            valid.append(t)
            valid.sort()
    return np.asarray(out, np.int32)


# ------------------------------------------------------------- torch side
def build_torch_modules(cfg, seed=123):
    import torch

    install_reference(torch)
    from models.lightweight_seg import Context_Guided_Network
    from models.linearStyleTransfer import encoder_sameoutputsize, style_net
    from models.nerf import NeRF_sigma, PosEmbedding

    class RefArgs:
        nerf_out_dim = cfg.nerf_out_dim
        pertubeCord = False
        img_wh = (cfg.grid_hw, cfg.grid_hw)

    torch.manual_seed(seed)
    in_xyz = 6 * cfg.N_emb_xyz + 3
    in_dir = 6 * cfg.N_emb_dir + 3
    mods = {
        "nerf_coarse": NeRF_sigma(
            "coarse", RefArgs, D=cfg.netdepth, W=cfg.netwidth,
            in_channels_xyz=in_xyz, in_channels_dir=in_dir,
        ),
        "nerf_fine": NeRF_sigma(
            "fine", RefArgs, D=cfg.netdepth, W=cfg.netwidth,
            in_channels_xyz=in_xyz, in_channels_dir=in_dir,
            encode_appearance=cfg.encode_a,
            encode_random=cfg.encode_random,
        ),
        "enc_a": encoder_sameoutputsize(out_channel=cfg.nerf_out_dim),
        "enc_cont": encoder_sameoutputsize(out_channel=cfg.nerf_out_dim),
        "decoder": style_net(RefArgs),
        "implicit_mask": Context_Guided_Network(
            classes=1, M=2, N=2, input_channel=3
        ),
    }
    embeddings = {
        "xyz": PosEmbedding(cfg.N_emb_xyz - 1, cfg.N_emb_xyz),
        "dir": PosEmbedding(cfg.N_emb_dir - 1, cfg.N_emb_dir),
    }
    return mods, embeddings, RefArgs


def val_torch(cfg, mods, embeddings, ref_args, scene) -> float:
    """Held-out full-image PSNR, reference validation semantics
    (train_mask_grid_sample.py:423-453: eval-mode modules, the image's
    OWN appearance, deterministic render, PSNR on rgb_fine)."""
    import torch

    from models.rendering import render_rays_cross_ray

    from crnerf_tpu.data.pipeline import full_image_batch

    im = scene.test_images[0]
    w, h = im.wh
    b = full_image_batch(scene, im)
    for m in mods.values():
        m.eval()
    try:
        with torch.no_grad():
            rays = torch.from_numpy(b["rays"][:, :8].astype(np.float32))
            ts = torch.from_numpy(b["ts"].astype(np.int64))
            whole = torch.from_numpy(
                b["whole_img"].astype(np.float32)
            ).permute(0, 3, 1, 2)
            whole01 = (whole + 1) / 2
            kwargs = {"args": ref_args, "H": h, "W": w}
            kwargs["a_embedded_from_img"] = mods["enc_a"](whole01)
            pred_mask = mods["implicit_mask"](whole01)
            pred_mask = torch.nn.functional.interpolate(
                pred_mask, size=(h, w), mode="bilinear",
                align_corners=False,
            )
            kwargs["mask_embedded_from_img"] = (
                pred_mask.permute(0, 2, 3, 1).reshape(-1, 1)
            )
            results = render_rays_cross_ray(
                {"coarse": mods["nerf_coarse"], "fine": mods["nerf_fine"]},
                embeddings, rays, ts, cfg.N_samples, False, 0.0, 0.0,
                cfg.N_importance, cfg.chunk, False, test_time=False,
                **kwargs,
            )
            fmap = results["feature_fine"].t().reshape(1, -1, h, w)
            img_f = mods["decoder"](fmap, kwargs["a_embedded_from_img"])
            rgb = img_f.permute(0, 2, 3, 1).reshape(-1, 3)
            gt = torch.from_numpy(b["rgbs"].astype(np.float32))
            mse = torch.mean((rgb - gt) ** 2)
            return float(-10 * torch.log10(mse))
    finally:
        for m in mods.values():
            m.train()


def run_torch(cfg, mods, embeddings, ref_args, batches,
              steps_per_epoch: int, sel_idx=None,
              val_fn=None, val_out=None) -> List[Dict]:
    """The reference training loop, transcribed from
    train_mask_grid_sample.py:268-337 + forward:151-226 + decode:127-149,
    utils get_optimizer/get_scheduler (Adam eps=1e-8, per-epoch cosine
    eta_min=1e-8). ``sel_idx`` (encode_random on): per-step cache pick,
    standing in for the reference's random.choice (train…py:166)."""
    import torch
    from models.rendering import render_rays_cross_ray

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    ref_losses = __import__("losses")

    class HP:
        maskrs_max, maskrs_min, maskrs_k = 5e-2, 6e-3, 1e-3
        maskrd = 0.0
        weightKL, weightRecA, weightMS = 1e-5, 1e-3, 1e-6
        weightcontent = 1e-4
        use_mask = True
        encode_random = cfg.encode_random
        mse_on_appearance = False
        dataset_name = "phototourism"

    loss_fn = ref_losses.CRNeRFLoss(HP())
    params = []
    for m in mods.values():
        params += list(m.parameters())
    opt = torch.optim.Adam(params, lr=cfg.lr, eps=1e-8)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=cfg.num_epochs, eta_min=1e-8
    )
    for m in mods.values():
        m.train()

    gh = int(math.isqrt(cfg.batch_size))
    emb_cache: Dict[int, "torch.Tensor"] = {}  # the embedding_a_list
    records = []
    for step, b in enumerate(batches):
        rays = torch.from_numpy(b["rays"].astype(np.float32))
        ts = torch.from_numpy(b["ts"].astype(np.int64))
        rgbs = torch.from_numpy(b["rgbs"].astype(np.float32))
        whole = torch.from_numpy(
            b["whole_img"].astype(np.float32)
        ).permute(0, 3, 1, 2)  # NHWC -> NCHW
        rgb_idx = torch.from_numpy(b["pixel_idx"].astype(np.int64))
        w_img, h_img = b["img_wh"]

        kwargs = {"args": ref_args, "H": gh, "W": gh}
        whole01 = (whole + 1) / 2  # train…py:156
        kwargs["a_embedded_from_img"] = mods["enc_a"](whole01)
        pred_mask = mods["implicit_mask"](whole01)
        pred_mask = torch.nn.functional.interpolate(
            pred_mask, size=(h_img, w_img), mode="bilinear",
            align_corners=False,
        )
        pred_mask = pred_mask.permute(0, 2, 3, 1).reshape(-1, 1)
        kwargs["mask_embedded_from_img"] = pred_mask[rgb_idx]

        results = render_rays_cross_ray(
            {"coarse": mods["nerf_coarse"], "fine": mods["nerf_fine"]},
            embeddings, rays, ts, cfg.N_samples, False, cfg.perturb,
            cfg.noise_std, cfg.N_importance, cfg.chunk, False,
            test_time=False, **kwargs,
        )

        def decode(feature, style, kind=None):
            fmap = feature.t().reshape(1, -1, gh, gh)
            if kind == "content":
                return mods["decoder"](fmap, None, type="content")
            return mods["decoder"](fmap, style)

        img_c = decode(results["feature_coarse"],
                       kwargs["a_embedded_from_img"])
        results["rgb_coarse"] = img_c.permute(0, 2, 3, 1).reshape(-1, 3)
        img_f = decode(results["feature_fine"],
                       kwargs["a_embedded_from_img"])
        results["rgb_fine_img"] = img_f
        results["rgb_fine"] = img_f.permute(0, 2, 3, 1).reshape(-1, 3)
        img_content = decode(results["feature_fine"], None, kind="content")
        results["rgb_content_img"] = img_content
        results["out_mask"] = kwargs["mask_embedded_from_img"]
        results["a_embedded"] = kwargs["a_embedded_from_img"]
        results["content_with_a_embed"] = mods["enc_cont"](img_f)
        results["content_wo_a_embed"] = mods["enc_cont"](img_content)

        if cfg.encode_random:
            # train…py:161-166 (pick) + 216-221 (decode/re-encode/cache
            # write); feature_fine_random aliases feature_fine
            # (rendering.py:141)
            sel = int(sel_idx[step])
            a_rand = (
                kwargs["a_embedded_from_img"] if sel < 0
                else emb_cache[sel]
            )
            img_r = decode(results["feature_fine"], a_rand)
            results["a_embedded_random"] = a_rand
            results["a_embedded_random_rec"] = mods["enc_a"](img_r)
            results["rgb_fine_random"] = (
                img_r.permute(0, 2, 3, 1).reshape(-1, 3)
            )
            emb_cache[int(ts[0])] = (
                kwargs["a_embedded_from_img"].clone().detach()
            )

        loss_d, aw = loss_fn(results, rgbs, HP(), step)
        total = sum(loss_d.values())
        opt.zero_grad()
        total.backward()
        opt.step()

        with torch.no_grad():
            mse = torch.mean((results["rgb_fine"] - rgbs) ** 2)
            psnr = -10 * torch.log10(mse)
        rec = {"step": step, "loss": float(total), "psnr": float(psnr),
               "lr": opt.param_groups[0]["lr"]}
        for k, v in loss_d.items():
            rec[f"loss/{k}"] = float(v)
        records.append(rec)
        if (step + 1) % steps_per_epoch == 0:
            sched.step()
            if val_fn is not None:
                val_out.append(val_fn())
    return records


# --------------------------------------------------------------- jax side
def make_val_jax(cfg, system, scene):
    """Held-out full-image PSNR on the crnerf_tpu side (eval-mode
    forward, own appearance — mirrors val_torch)."""
    import jax
    import jax.numpy as jnp

    from crnerf_tpu.data.pipeline import full_image_batch

    im = scene.test_images[0]
    w, h = im.wh
    b = full_image_batch(scene, im)
    batch = {
        "rays": jnp.asarray(b["rays"][:, :8]),
        "whole_img": jnp.asarray(b["whole_img"]),
    }
    gt = jnp.asarray(b["rgbs"])

    @jax.jit
    def render(variables):
        results, _ = system.forward(
            variables, batch, jax.random.PRNGKey(0), train=False,
            image_hw=(h, w),
        )
        mse = jnp.mean((results["rgb_fine"] - gt) ** 2)
        return -10 * jnp.log10(mse)

    def fn(state):
        return float(render(
            {"params": state.params, "batch_stats": state.batch_stats}
        ))

    return fn


def run_jax(cfg, variables, batches, steps_per_epoch: int,
            step_times: Optional[list] = None,
            sel_idx=None, val_scene=None, val_out=None) -> List[Dict]:
    """step_times (optional list): appended with the wall seconds of each
    step INCLUDING its device_get — pass it to time warm steps within one
    jit instance (a fresh run_jax call rebuilds the jit and recompiles,
    so cross-call timing measures compile, not steps).

    ``sel_idx`` (encode_random parity): per-step forced cache pick shared
    with the torch run — installed by overriding the train step's
    ``_select_random_embedding`` to index the sequence by ``state.step``
    (harness-only; the production path keeps its uniform gumbel-max
    draw)."""
    import jax
    import jax.numpy as jnp

    from crnerf_tpu.render.system import CrNerfSystem
    from crnerf_tpu.train.optim import make_optimizer
    from crnerf_tpu.train.state import TrainState
    from crnerf_tpu.train import step as step_mod
    from crnerf_tpu.train.step import make_train_step

    system = CrNerfSystem(cfg)
    tx, sched = make_optimizer(cfg, iters_per_epoch=steps_per_epoch)
    state = TrainState.create(
        variables, tx.init(variables["params"]),
        n_vocab=cfg.N_vocab, embed_hw=32, embed_c=cfg.nerf_out_dim,
        rng=jax.random.PRNGKey(0),
    )
    orig_select = step_mod._select_random_embedding
    if sel_idx is not None:
        seq = jnp.asarray(np.asarray(sel_idx), jnp.int32)

        def forced_select(key, st):
            idx = seq[st.step]
            hw, c = st.embed_hw, st.embed_c
            emb = st.embedding_cache[jnp.maximum(idx, 0)].reshape(
                1, hw, hw, c
            ).astype(jnp.float32)
            return emb, idx >= 0

        step_mod._select_random_embedding = forced_select
    try:
        # the override must outlive the first step_fn call: the train step
        # resolves _select_random_embedding by module-global lookup at
        # TRACE time (first call), not at closure-build time
        step_fn = jax.jit(make_train_step(system, tx, sched))
        val_fn = (
            make_val_jax(cfg, system, val_scene)
            if val_scene is not None else None
        )
        records = []
        for step, b in enumerate(batches):
            db = {
                k: jnp.asarray(v)
                for k, v in b.items() if k not in ("pixel_idx", "img_wh")
            }
            t0 = time.perf_counter()
            state, m = step_fn(state, db)
            m = jax.device_get(m)
            if step_times is not None:
                step_times.append(time.perf_counter() - t0)
            records.append({k: float(v) for k, v in m.items()}
                           | {"step": step})
            if val_fn is not None and (step + 1) % steps_per_epoch == 0:
                val_out.append(val_fn(state))
    finally:
        step_mod._select_random_embedding = orig_select
    return records


# -------------------------------------------------------------- comparison
def compare(ref: List[Dict], ours: List[Dict], keys=None):
    """-> dict of trajectory stats per metric key."""
    keys = keys or [k for k in ref[0] if k != "step"]
    out = {}
    for k in keys:
        a = np.asarray([r[k] for r in ref])
        b = np.asarray([r.get(k, np.nan) for r in ours])
        if np.isnan(b).any():
            continue
        denom = np.maximum(np.abs(a), 1e-8)
        out[k] = {
            "ref_final": float(a[-1]),
            "ours_final": float(b[-1]),
            "max_rel": float(np.max(np.abs(a - b) / denom)),
            "mean_rel": float(np.mean(np.abs(a - b) / denom)),
        }
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--steps_per_epoch", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--encode_random", action="store_true",
                    help="drive the random-appearance branch + embedding-"
                         "cache feedback with a shared pick sequence")
    ap.add_argument("--val", action="store_true",
                    help="held-out full-image PSNR at every epoch "
                         "boundary, both trainers (the reference "
                         "validation_step analog)")
    ap.add_argument("--out", default=None,
                    help="write the full trajectories + stats as JSON")
    args = ap.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:  # backend already initialized
        pass
    if jax.default_backend() != "cpu":  # pragma: no cover
        raise SystemExit("run with JAX on CPU (torch side is CPU)")
    import torch

    torch.manual_seed(7)
    cfg = build_cfg(args.epochs, encode_random=args.encode_random)
    scene, pipe = make_data(cfg, seed=args.seed)
    batches = batches_for(pipe, args.epochs, args.steps_per_epoch)
    sel_idx = (
        draw_random_selections(batches, cfg.N_vocab)
        if args.encode_random else None
    )

    mods, embeddings, ref_args = build_torch_modules(cfg)
    sd = {}
    for prefix, m in mods.items():
        for k, v in m.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    from crnerf_tpu.utils.torch_port import convert_state_dict

    params, stats = convert_state_dict(sd, netdepth=cfg.netdepth)
    # _n() returns numpy VIEWS of the torch tensors, which the torch run
    # then mutates in place — snapshot the t=0 weights
    variables = jax.tree.map(
        np.array, {"params": params, "batch_stats": stats}
    )

    print(f"running torch reference trainer ({len(batches)} steps"
          f"{', encode_random' if args.encode_random else ''})...")
    val_ref: list = []
    val_fn = (
        (lambda: val_torch(cfg, mods, embeddings, ref_args, scene))
        if args.val else None
    )
    ref = run_torch(cfg, mods, embeddings, ref_args, batches,
                    args.steps_per_epoch, sel_idx=sel_idx,
                    val_fn=val_fn, val_out=val_ref)
    print("running crnerf_tpu trainer...")
    val_ours: list = []
    ours = run_jax(cfg, variables, batches, args.steps_per_epoch,
                   sel_idx=sel_idx,
                   val_scene=scene if args.val else None,
                   val_out=val_ours)

    stats = compare(ref, ours)
    print(f"\n{'metric':<22}{'ref final':>12}{'ours final':>12}"
          f"{'max rel':>10}{'mean rel':>10}")
    for k, s in stats.items():
        print(f"{k:<22}{s['ref_final']:>12.6f}{s['ours_final']:>12.6f}"
              f"{s['max_rel']:>10.4f}{s['mean_rel']:>10.4f}")
    dpsnr = abs(stats["psnr"]["ref_final"] - stats["psnr"]["ours_final"])
    print(f"\nfinal PSNR delta: {dpsnr:.3f} dB over {len(batches)} steps")
    if args.val:
        print(f"\n{'epoch':<8}{'ref val psnr':>14}{'ours val psnr':>14}"
              f"{'delta dB':>10}")
        for e, (a, b) in enumerate(zip(val_ref, val_ours)):
            print(f"{e + 1:<8}{a:>14.3f}{b:>14.3f}{abs(a - b):>10.3f}")
    if args.out:
        import json

        with open(args.out, "w") as f:
            json.dump({
                "argv": vars(args), "stats": stats,
                "ref": ref, "ours": ours,
                "val_ref": val_ref, "val_ours": val_ours,
            }, f, indent=1)
        print(f"wrote {args.out}")
    return ref, ours, stats


if __name__ == "__main__":
    main()
