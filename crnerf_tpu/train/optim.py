"""Optimizers and LR schedules via optax.

Reference: ``get_optimizer``/``get_scheduler``
(/root/reference/utils/__init__.py:24-61) + ``GradualWarmupScheduler``
(utils/warmup_scheduler.py:4-58). The reference steps schedulers once per
*epoch* (Lightning default); we reproduce that by making the schedule a
function of ``step // iters_per_epoch``.

- sgd(momentum) | adam(eps=1e-8) | radam | ranger (true
  torch_optimizer.Ranger: gradient centralization + RAdam(0.95, 0.999,
  N_sma_threshhold=5) + slow-weight Lookahead(k=6, alpha=0.5))
- cosine: CosineAnnealingLR(T_max=num_epochs, eta_min=1e-8)
- steplr: MultiStepLR(milestones=decay_step, gamma=decay_gamma)
- poly: (1 - e/num_epochs)^poly_exp
- warmup: linear ramp of the multiplier over warmup_epochs, then the wrapped
  schedule on base_lr * multiplier (warmup_scheduler.py:23-33)
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import chex
import jax
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


# --------------------------------------------------------------- Ranger
# The reference's `ranger` option is torch_optimizer.Ranger
# (/root/reference/utils/__init__.py:30-38): gradient centralization +
# RAdam (betas=(0.95, 0.999), N_sma_threshhold=5) + Lookahead(k=6, a=0.5).
# The three pieces below reproduce that exactly (tests/test_train.py holds
# a step-by-step trajectory comparison against an independent torch
# transcription of the published algorithms).


def gradient_centralization() -> optax.GradientTransformation:
    """GC (Yong et al. 2020): subtract each filter's mean from its gradient
    for every parameter with ndim > 1. Flax kernels carry the output
    dimension LAST ((in, out) dense / (kh, kw, in, out) conv), so the mean
    runs over all axes but the last (torch's dim-0-out layout means dims
    1..n there)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def gc(g):
            if g.ndim <= 1:
                return g
            axes = tuple(range(g.ndim - 1))
            return g - jnp.mean(g, axis=axes, keepdims=True)

        return jax.tree.map(gc, updates), state

    return optax.GradientTransformation(init, update)


class ScaleByRangerRAdamState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates


def scale_by_ranger_radam(
    b1: float = 0.95,
    b2: float = 0.999,
    eps: float = 1e-8,
    threshold: float = 5.0,
) -> optax.GradientTransformation:
    """RAdam with torch_optimizer.Ranger's exact arithmetic. Differs from
    ``optax.scale_by_radam`` only in epsilon placement: Ranger adds eps to
    sqrt(nu) BEFORE variance bias-correction (folded into step_size), optax
    adds it after — ~1-ulp for eps=1e-8 but enough to diverge a trajectory
    comparison."""

    def init(params):
        return ScaleByRangerRAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.result_type(float))
        mu = jax.tree.map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates
        )
        nu = jax.tree.map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates
        )
        b2t = b2 ** t
        rho_inf = 2.0 / (1 - b2) - 1.0
        rho = rho_inf - 2.0 * t * b2t / (1 - b2t)
        rect = jnp.sqrt(
            (1 - b2t)
            * (rho - 4) / (rho_inf - 4)
            * (rho - 2) / rho
            * rho_inf / (rho_inf - 2)
        )
        bias1 = 1 - b1 ** t
        use_var = rho > threshold
        step_var = jnp.where(use_var, rect, 1.0) / bias1

        def one(m, v):
            var = step_var * m / (jnp.sqrt(v) + eps)
            plain = m / bias1
            return jnp.where(use_var, var, plain)

        out = jax.tree.map(one, mu, nu)
        return out, ScaleByRangerRAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


class LookaheadState(NamedTuple):
    count: chex.Array
    slow: optax.Params


def lookahead(k: int = 6, alpha: float = 0.5) -> optax.GradientTransformation:
    """True slow-weight Lookahead (Zhang et al. 2019) as the LAST link of a
    chain: every k steps the emitted update rewrites the fast weights to
    slow + alpha * (fast - slow). Unlike ``optax.lookahead`` the slow
    weights live in the OPTIMIZER state, so params keep their plain pytree
    shape (no fast/slow wrapper leaking into TrainState/checkpoints)."""

    def init(params):
        return LookaheadState(
            count=jnp.zeros([], jnp.int32),
            slow=jax.tree.map(jnp.array, params),
        )

    def update(updates, state, params):
        if params is None:
            raise ValueError("lookahead needs params")
        count = state.count + 1
        sync = (count % k) == 0

        def one(u, p, s):
            fast = p + u
            slow_new = s + alpha * (fast - s)
            u_out = jnp.where(sync, slow_new - p, u)
            s_out = jnp.where(sync, slow_new, s)
            return u_out, s_out

        flat = jax.tree.map(one, updates, params, state.slow)
        u_out = jax.tree.map(lambda x: x[0], flat,
                             is_leaf=lambda x: isinstance(x, tuple))
        s_out = jax.tree.map(lambda x: x[1], flat,
                             is_leaf=lambda x: isinstance(x, tuple))
        return u_out, LookaheadState(count=count, slow=s_out)

    return optax.GradientTransformation(init, update)


def ranger(
    lr_sched,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    k: int = 6,
    alpha: float = 0.5,
) -> optax.GradientTransformation:
    """torch_optimizer.Ranger equivalence: GC -> RAdam(0.95, 0.999,
    thresh 5) -> lr -> [decoupled wd] -> Lookahead(k=6, 0.5)."""
    links = [
        gradient_centralization(),
        scale_by_ranger_radam(eps=eps),
    ]
    if weight_decay > 0:
        # Ranger applies p -= wd * lr * p alongside the radam step: adding
        # wd*p BEFORE the -lr scale yields exactly that extra -lr*wd*p term
        links.append(optax.add_decayed_weights(weight_decay))
    links += [
        optax.scale_by_learning_rate(lr_sched),
        lookahead(k=k, alpha=alpha),
    ]
    return optax.chain(*links)


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
        # true torch_optimizer.Ranger semantics (GC + RAdam + slow-weight
        # Lookahead k=6 a=0.5); weight decay handled inside (decoupled,
        # -wd*lr*p, matching torch)
        return ranger(sched, eps=eps, weight_decay=cfg.weight_decay), sched
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")

    if cfg.weight_decay > 0:
        tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    return tx, sched
