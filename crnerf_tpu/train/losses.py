"""The CR-NeRF loss family.

Reference: ``CRNeRFLoss`` (/root/reference/losses.py:42-94) — a dict of
terms summed by the caller (train…py:285):

- ``kl_a``: L2 on the style embedding x weightKL (losses.py:53)
- ``rec_a_random``: L1 (or MSE with mse_on_appearance) between the chosen
  random embedding (detached) and the embedding re-encoded from the
  random-styled render, x weightRecA (losses.py:54-57)
- ``c_l`` / ``f_l``: half-MSE of coarse/fine RGB vs GT, down-weighted
  per-pixel by (1 - mask); the coarse term detaches the mask, the fine term
  does NOT (losses.py:62,70 — faithful quirk)
- ``r_ms`` / ``r_md``: mask size/digit regularizers; the size weight anneals
  exponentially max->min with rate k (losses.py:79-89,30-39)
- ``content_constraint``: MSE between content embeddings of styled vs
  unstyled renders x weightcontent (losses.py:65-66)

All weights/annealing mirror opt.py defaults. Pure function of
(results, targets, step) -> (dict, annealing_weight).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


class CosineAnnealingWeight:
    """losses.py:19-28."""

    def __init__(self, max_w: float, min_w: float, t_max: float):
        self.max = max_w
        self.min = min_w
        self.t_max = t_max

    def __call__(self, t):
        return self.min + (self.max - self.min) * (
            1 + jnp.cos(math.pi * t / self.t_max)
        ) / 2


class ExponentialAnnealingWeight:
    """losses.py:30-39: max(min, max * exp(-t*k))."""

    def __init__(self, max_w: float, min_w: float, k: float):
        self.max = max_w
        self.min = min_w
        self.k = k

    def __call__(self, t):
        t = jnp.asarray(t, jnp.float32)
        return jnp.maximum(self.min, self.max * jnp.exp(-t * self.k))


def mask_regularize(mask, size_delta, digit_delta):
    """losses.py:79-89: keep the mask from eating the image."""
    focus_epsilon = 0.02
    loss_focus_size = jnp.mean(mask ** 2) * size_delta
    loss_focus_digit = jnp.mean(
        1.0 / ((mask - 0.5) ** 2 + focus_epsilon)
    ) * digit_delta
    return loss_focus_size, loss_focus_digit


def crnerf_loss(
    results: Dict[str, jax.Array],
    targets: jax.Array,
    global_step,
    *,
    weightKL: float = 1e-5,
    weightRecA: float = 1e-3,
    weightcontent: float = 1e-4,
    maskrs_max: float = 5e-2,
    maskrs_min: float = 6e-3,
    maskrs_k: float = 1e-3,
    maskrd: float = 0.0,
    mse_on_appearance: bool = False,
    coef: float = 1.0,
) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """Returns ({term: value}, annealing_weight). Total loss = sum(values)."""
    annealing = ExponentialAnnealingWeight(maskrs_max, maskrs_min, maskrs_k)
    ret: Dict[str, jax.Array] = {}

    if "a_embedded" in results:
        ret["kl_a"] = jnp.mean(results["a_embedded"] ** 2) * weightKL
        if "a_embedded_random_rec" in results:
            diff = (
                jax.lax.stop_gradient(results["a_embedded_random"])
                - results["a_embedded_random_rec"]
            )
            if mse_on_appearance:
                ret["rec_a_random"] = jnp.mean(diff ** 2) * weightRecA
            else:
                ret["rec_a_random"] = jnp.mean(jnp.abs(diff)) * weightRecA

    if "out_mask" in results:
        mask = results["out_mask"]
        ret["c_l"] = 0.5 * jnp.mean(
            (1 - jax.lax.stop_gradient(mask))
            * (results["rgb_coarse"] - targets) ** 2
        )
    else:
        ret["c_l"] = 0.5 * jnp.mean((results["rgb_coarse"] - targets) ** 2)

    if "content_wo_a_embed" in results and "content_with_a_embed" in results:
        ret["content_constraint"] = (
            jnp.mean(
                (results["content_wo_a_embed"] - results["content_with_a_embed"])
                ** 2
            )
            * weightcontent
        )

    aw = annealing(global_step)
    if "rgb_fine" in results:
        if "out_mask" in results:
            ret["r_ms"], ret["r_md"] = mask_regularize(
                results["out_mask"], aw, maskrd
            )
            # fine term intentionally does NOT detach the mask
            # (losses.py:70)
            ret["f_l"] = 0.5 * jnp.mean(
                (1 - results["out_mask"]) * (results["rgb_fine"] - targets) ** 2
            )
        else:
            ret["f_l"] = 0.5 * jnp.mean((results["rgb_fine"] - targets) ** 2)

    return {k: coef * v for k, v in ret.items()}, aw


def color_loss(results, targets, coef: float = 1.0):
    """Plain NeRF MSE loss (reference ``ColorLoss``, losses.py:6-17)."""
    loss = jnp.mean((results["rgb_coarse"] - targets) ** 2)
    if "rgb_fine" in results:
        loss = loss + jnp.mean((results["rgb_fine"] - targets) ** 2)
    return coef * loss


ColorLoss = color_loss
loss_dict = {"color": color_loss, "crnerf": crnerf_loss}
