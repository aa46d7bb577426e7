"""The jitted training step (single-chip and shard_map data-parallel).

Equivalent of ``NeRFSystem.training_step`` (/root/reference/
train_mask_grid_sample.py:268-337) as one pure function:
(state, batch) -> (state', metrics). Distribution (SURVEY.md §2.9): the
reference's Lightning-DDP/NCCL all-reduce becomes ``shard_map`` over a
``Mesh`` with ``psum`` over ICI; each device consumes its own image-grid
(global batch = n_devices grids, matching DDP's per-rank batches).

The random-appearance branch (train…py:161-166,216-221): a cached style
embedding is drawn uniformly from the filled entries of the cache; while the
cache is empty the live embedding is used (the reference uses the live
embedding with gradient in that warm-up case — we keep that). After the
step, every device's (ts, embedding) write is all-gathered and applied on
every replica so caches stay identical across the mesh — the reference's
per-rank caches silently diverge under DDP (SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from crnerf_tpu.render.system import CrNerfSystem
from crnerf_tpu.train.losses import crnerf_loss
from crnerf_tpu.train.metrics import psnr
from crnerf_tpu.train.state import TrainState


def _select_random_embedding(key, state: TrainState):
    """Uniform draw over valid cache entries; returns (emb (1,32,32,C),
    has_any bool)."""
    valid = state.embedding_valid
    n = valid.shape[0]
    has_any = jnp.any(valid)
    # uniform over valid via gumbel-max on the mask (exact uniform among
    # valid entries, fixed shapes)
    g = jax.random.gumbel(key, (n,))
    scores = jnp.where(valid, g, -jnp.inf)
    idx = jnp.argmax(scores)
    hw, c = state.embed_hw, state.embed_c
    emb = state.embedding_cache[idx].reshape(1, hw, hw, c).astype(
        jnp.float32
    )
    return emb, has_any


def make_train_step(system: CrNerfSystem, tx, lr_sched,
                    axis_name: Optional[str] = None,
                    grids_per_step: int = 1,
                    grad_accum_chunks: int = 1,
                    chunk_unroll: bool = False):
    """Build the pure train-step function.

    ``axis_name`` set -> gradients are psum-averaged and embedding-cache
    writes are all-gathered over that mesh axis (call inside shard_map).

    ``grids_per_step`` G > 1 -> every batch leaf carries a leading G axis of
    INDEPENDENT image grids, vmapped through the forward with the losses
    averaged. Semantically this is the reference's ``--num_gpus G`` DDP run
    (G per-rank grids, grad all-reduce — train…py:445-447) folded onto
    fewer chips; practically it is how a single TPU chip gets fed enough
    points to saturate the MXU (1024 rays x 192 samples is far below
    one chip's FLOP capacity).

    ``grad_accum_chunks`` C > 1 -> the G grids are processed as C
    sequential chunks of G/C (lax.scan) with gradients and metrics
    accumulated — the same mean up to fp order, while bounding the live
    activation memory to one chunk (required by the ``pallas_stash``
    backward, whose HBM stash spans one chunk's forward->backward).
    """
    if grad_accum_chunks > 1 and grids_per_step % grad_accum_chunks:
        raise ValueError(
            f"grad_accum_chunks={grad_accum_chunks} must divide "
            f"grids_per_step={grids_per_step}"
        )
    cfg = system.cfg

    def one_grid_loss(params, state: TrainState, batch, key, a_rand,
                      has_any, heads=None):
        variables = {"params": params, "batch_stats": state.batch_stats}
        kf, = jax.random.split(key, 1)
        results, new_bs = system.forward(
            variables, batch, kf,
            a_embedded_random=a_rand if cfg.encode_random and cfg.encode_a
            else None,
            random_has_any=has_any,
            train=True,
            precomputed_heads=(
                None if heads is None
                else (heads.get("a"), heads.get("m"))
            ),
        )
        loss_d, aw = crnerf_loss(
            results, batch["rgbs"], state.step,
            weightKL=cfg.weightKL, weightRecA=cfg.weightRecA,
            weightcontent=cfg.weightcontent, maskrs_max=cfg.maskrs_max,
            maskrs_min=cfg.maskrs_min, maskrs_k=cfg.maskrs_k,
            maskrd=cfg.maskrd, mse_on_appearance=cfg.mse_on_appearance,
        )
        total = sum(loss_d.values())
        typ = "rgb_fine" if "rgb_fine" in results else "rgb_coarse"
        aux = {
            "loss_d": loss_d,
            "aw": aw,
            "psnr": psnr(
                jax.lax.stop_gradient(results[typ]), batch["rgbs"]
            ),
            "new_bs": new_bs,
            "a_embedded": results.get("a_embedded"),
        }
        return total, aux

    def mean_over_grids(params, state: TrainState, batch_g, keys_g,
                        a_rand_g, has_any, heads_g=None):
        """vmap one_grid_loss over a leading grid axis and average the
        per-grid scalars (grad of mean == DDP pmean); BN stats likewise
        averaged across grids (the DP pmean analog). ``heads_g`` set (a
        possibly-empty dict) -> the hoisted-heads variant with a vmapped
        heads argument.

        fold_heads (default OFF — measured -10..-13%, see Config):
        the appearance encoder runs ONCE on the
        grids' whole images FOLDED into a plain 4-D batch instead of
        vmapped per grid. Identical math (convs/pools are per-sample;
        enc_a has no batch coupling — tests pin grad equality), but the
        vmapped form lowers to 5-D batch-grouped convolutions whose TPU
        emitters run at 14-25% of MXU peak, while the SAME convs on a
        4-D batch measure at ~peak (scripts/spike_packed_conv.py,
        BASELINE.md 2026-08-19). Computed inside the differentiated loss,
        so no vjp plumbing (unlike hoist_heads); CGNet stays vmapped to
        keep the reference's per-grid batch-1 BN semantics."""
        if cfg.encode_a and getattr(cfg, "fold_heads", False) and (
            heads_g is None or "a" not in heads_g
        ):
            w = batch_g["whole_img"]            # (G, 1, Ha, Wa, 3)
            g, b1 = w.shape[0], w.shape[1]
            folded = ((w + 1.0) / 2.0).reshape(g * b1, *w.shape[2:])
            a_emb = system.m.enc_a.apply(
                {"params": params["enc_a"]}, folded
            )
            heads_g = dict(heads_g or {})
            heads_g["a"] = a_emb.reshape(g, b1, *a_emb.shape[1:])
        if heads_g == {}:
            heads_g = None
        if heads_g is None:
            totals, aux = jax.vmap(
                one_grid_loss, in_axes=(None, None, 0, 0, 0, None)
            )(params, state, batch_g, keys_g, a_rand_g, has_any)
        else:
            totals, aux = jax.vmap(
                one_grid_loss, in_axes=(None, None, 0, 0, 0, None, 0),
            )(params, state, batch_g, keys_g, a_rand_g, has_any, heads_g)
        mean_aux = {
            "loss_d": jax.tree.map(jnp.mean, aux["loss_d"]),
            "aw": jnp.mean(aux["aw"]),
            "psnr": jnp.mean(aux["psnr"]),
            "new_bs": None if aux["new_bs"] is None else jax.tree.map(
                lambda x: jnp.mean(x, axis=0), aux["new_bs"]
            ),
            "a_embedded": aux["a_embedded"],  # keep per-grid (G, 1, ...)
        }
        return jnp.mean(totals), mean_aux

    def loss_fn(params, state: TrainState, batch, key, a_rand, has_any):
        if grids_per_step == 1:
            return one_grid_loss(params, state, batch, key, a_rand,
                                 has_any)
        keys = jax.random.split(key, grids_per_step)
        return mean_over_grids(params, state, batch, keys, a_rand,
                               has_any)

    def train_step(state: TrainState, batch: Dict[str, jax.Array]
                   ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng, kstep, ksel = jax.random.split(state.rng, 3)
        if axis_name is not None:
            # decorrelate per-device randomness
            kstep = jax.random.fold_in(kstep, jax.lax.axis_index(axis_name))
            ksel = jax.random.fold_in(ksel, jax.lax.axis_index(axis_name))

        if grids_per_step > 1:
            sel_keys = jax.random.split(ksel, grids_per_step)
            a_rand, has_any = jax.vmap(
                _select_random_embedding, in_axes=(0, None)
            )(sel_keys, state)
            has_any = has_any[0]  # same cache on every grid
        else:
            a_rand, has_any = _select_random_embedding(ksel, state)
        if grad_accum_chunks > 1 and grids_per_step > 1:
            c = grad_accum_chunks
            gc = grids_per_step // c
            keys = jax.random.split(kstep, grids_per_step)

            # ---- optionally hoist the conv heads (enc_a on whole images
            # + CGNet mask) OUT of the chunk scan: computed once, batched
            # over all G grids (vmap keeps the reference's per-grid
            # batch-1 BN), gradients routed back through jax.vjp
            # cotangents. Measured slightly SLOWER at C=2 (the vjp
            # serializes against the scan — config.py hoist_heads), so
            # off unless asked for.
            hoist = (cfg.encode_a or cfg.use_mask) and getattr(
                cfg, "hoist_heads", False
            )
            heads_xs = {}
            heads_vjp = None
            hoisted_bs = None
            if hoist:
                whole01_all = (batch["whole_img"] + 1.0) / 2.0

                def heads_fn(enc_p, mask_p):
                    a_emb = None
                    masks = None
                    aux_bs = None
                    if cfg.encode_a and getattr(cfg, "fold_heads", False):
                        # fold+hoist: enc_a once on the grids folded into
                        # a plain 4-D batch, OUTSIDE the chunk scan. The
                        # in-loss fold (mean_over_grids) was rejected on
                        # TPU because its cotangents, flowing through the
                        # fold reshapes inside the differentiated chunk
                        # scan, realize as giant batch-transposed wgrad
                        # contractions (BASELINE.md 2026-08-19, 34 ms x2);
                        # here the vjp is built from a non-vmapped 4-D
                        # trace so fwd AND bwd are the emitter-peak plain
                        # conv forms. Exact math either way (enc_a has no
                        # cross-sample coupling).
                        gw, b1 = whole01_all.shape[:2]
                        folded = whole01_all.reshape(
                            gw * b1, *whole01_all.shape[2:]
                        )
                        a4 = system.m.enc_a.apply({"params": enc_p}, folded)
                        a_emb = a4.reshape(gw, b1, *a4.shape[1:])
                    elif cfg.encode_a:
                        a_emb = jax.vmap(
                            lambda w: system.m.enc_a.apply(
                                {"params": enc_p}, w
                            )
                        )(whole01_all)            # (G, 1, 32, 32, C)
                    if cfg.use_mask:
                        def one(w):
                            v = {
                                "params": {"implicit_mask": mask_p},
                                "batch_stats": state.batch_stats,
                            }
                            return system.predict_mask(v, w, True)

                        masks, aux_bs = jax.vmap(one)(whole01_all)
                    return (a_emb, masks), aux_bs

                (heads_all, heads_vjp, hoisted_bs) = jax.vjp(
                    heads_fn,
                    state.params.get("enc_a"),
                    state.params.get("implicit_mask"),
                    has_aux=True,
                )
                if heads_all[0] is not None:
                    heads_xs["a"] = heads_all[0]
                if heads_all[1] is not None:
                    heads_xs["m"] = heads_all[1]

            def chunk_loss(params, heads_c, batch_c, keys_c, a_rand_c):
                return mean_over_grids(params, state, batch_c, keys_c,
                                       a_rand_c, has_any, heads_c)

            reshape_c = lambda x: x.reshape(  # noqa: E731
                c, gc, *x.shape[1:]
            )
            batch_r = jax.tree.map(reshape_c, batch)
            keys_r = keys.reshape(c, gc, *keys.shape[1:])
            a_rand_r = reshape_c(a_rand)
            heads_r = {k: reshape_c(v) for k, v in heads_xs.items()}
            zero_g = jax.tree.map(jnp.zeros_like, state.params)

            def body(gsum, xs):
                b_c, k_c, ar_c, h_c = xs
                (tot_c, aux_c), (g_c, gh_c) = jax.value_and_grad(
                    chunk_loss, argnums=(0, 1), has_aux=True
                )(state.params, h_c, b_c, k_c, ar_c)
                gsum = jax.tree.map(lambda a_, b_: a_ + b_, gsum, g_c)
                # head cotangents ride the scan ys back to (C, gc, ...)
                return gsum, (tot_c, aux_c, gh_c)

            # chunk_unroll inlines every chunk into one XLA block so the
            # scheduler can overlap chunk i's flat tail (sample_pdf,
            # losses) with chunk i+1's MLP kernels — a scan body is a
            # hard pipeline boundary. Same math; A/B knob.
            gsum, (tots, auxs, gh_all) = jax.lax.scan(
                body, zero_g,
                (batch_r, keys_r, a_rand_r, heads_r),
                unroll=c if chunk_unroll else 1,
            )
            grads = jax.tree.map(lambda x: x / c, gsum)
            total = jnp.mean(tots)
            if hoist and heads_vjp is not None:
                # gh_all leaves are (C, gc, ...) — flatten back to the
                # (G, ...) layout and scale by the chunk mean factor
                def unchunk(x):
                    return x.reshape(grids_per_step, *x.shape[2:]) / c

                ct_a = (
                    unchunk(gh_all["a"]) if "a" in gh_all else None
                )
                ct_m = (
                    unchunk(gh_all["m"]) if "m" in gh_all else None
                )
                d_enc, d_mask = heads_vjp((ct_a, ct_m))
                if d_enc is not None and "enc_a" in grads:
                    grads["enc_a"] = jax.tree.map(
                        lambda a_, b_: a_ + b_, grads["enc_a"], d_enc
                    )
                if d_mask is not None and "implicit_mask" in grads:
                    grads["implicit_mask"] = jax.tree.map(
                        lambda a_, b_: a_ + b_, grads["implicit_mask"],
                        d_mask,
                    )
            aux = {
                "loss_d": jax.tree.map(jnp.mean, auxs["loss_d"]),
                "aw": jnp.mean(auxs["aw"]),
                "psnr": jnp.mean(auxs["psnr"]),
                "new_bs": (
                    jax.tree.map(
                        lambda x: jnp.mean(x, axis=0), hoisted_bs
                    ) if hoisted_bs is not None else (
                        None if auxs["new_bs"] is None else
                        jax.tree.map(lambda x: jnp.mean(x, axis=0),
                                     auxs["new_bs"])
                    )
                ),
                "a_embedded": None if auxs["a_embedded"] is None else
                jax.tree.map(
                    lambda x: x.reshape(grids_per_step, *x.shape[2:]),
                    auxs["a_embedded"],
                ),
            }
        else:
            (total, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state, batch, kstep, a_rand, has_any)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            total = jax.lax.pmean(total, axis_name)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda p, u: p + u, state.params, updates
        )

        new_cache, new_valid = state.embedding_cache, state.embedding_valid
        if cfg.encode_a and cfg.encode_random:
            a_emb = jax.lax.stop_gradient(aux["a_embedded"])
            if grids_per_step > 1:
                loc_ts = batch["ts"][:, 0]                    # (G,)
                loc_emb = a_emb[:, 0].astype(
                    state.embedding_cache.dtype
                )                                             # (G, 32, 32, C)
            else:
                loc_ts = batch["ts"][0][None]
                loc_emb = a_emb[0][None].astype(
                    state.embedding_cache.dtype
                )
            if axis_name is not None:
                loc_ts = jax.lax.all_gather(
                    loc_ts, axis_name
                ).reshape(-1)                                  # (D*G,)
                loc_emb = jax.lax.all_gather(
                    loc_emb, axis_name
                ).reshape(-1, *loc_emb.shape[1:])              # (D*G, ...)

            # one batched ROW scatter into the flat cache (a fori_loop of
            # per-entry dynamic-update-slices cost ~7 ms/step at G=16).
            # Duplicate ts in a batch scatter identical values (same
            # whole_img + params -> bitwise-equal embeddings), so write
            # order is irrelevant.
            new_cache = new_cache.at[loc_ts].set(
                loc_emb.reshape(loc_ts.shape[0], -1)
            )
            new_valid = new_valid.at[loc_ts].set(True)

        new_bs = aux["new_bs"] if aux["new_bs"] is not None else (
            state.batch_stats
        )
        if axis_name is not None and aux["new_bs"] is not None:
            # keep BN running stats replica-identical
            new_bs = jax.lax.pmean(new_bs, axis_name)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            embedding_cache=new_cache,
            embedding_valid=new_valid,
            rng=rng,
        )
        metrics = {
            "loss": total,
            "psnr": aux["psnr"],
            "annealing_weight": aux["aw"],
            "lr": lr_sched(state.step),
        }
        for k, v in aux["loss_d"].items():
            metrics[f"loss/{k}"] = v
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return new_state, metrics

    return train_step
