"""Depth-sample generation along rays.

Reference semantics (/root/reference/models/rendering.py):
- stratified z values linear in depth or disparity (rendering.py:161-167)
- bin perturbation by `perturb * U[0,1)` within mid-point intervals
  (rendering.py:169-176)
- hierarchical inverse-CDF resampling from coarse weights (`sample_pdf`,
  rendering.py:7-46): weights+eps -> pdf -> cdf (0-padded), searchsorted
  right, clamped below/above, linear interp inside the bin, denom<eps -> 1.

All functions are pure; randomness comes in as explicit jax.random keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_zvals(near, far, n_samples: int, use_disp: bool = False):
    """(N_rays, 1) near/far -> (N_rays, n_samples) z values.

    Linear in depth, or linear in disparity when use_disp
    (rendering.py:161-167).
    """
    z_steps = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    if not use_disp:
        z_vals = near * (1.0 - z_steps) + far * z_steps
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - z_steps) + 1.0 / far * z_steps)
    return z_vals


def perturb_zvals(key, z_vals, perturb: float):
    """Jitter samples inside mid-point intervals (rendering.py:169-176).

    Note the reference multiplies U[0,1) by `perturb` (not clamping), so
    perturb=1 gives full-interval stratified jitter.
    """
    z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
    upper = jnp.concatenate([z_mid, z_vals[:, -1:]], -1)
    lower = jnp.concatenate([z_vals[:, :1], z_mid], -1)
    u = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * (perturb * u)


def sample_pdf(key, bins, weights, n_importance: int, det: bool,
               eps: float = 1e-5, impl: str = "onehot"):
    """Inverse-CDF sampling (rendering.py:7-46).

    bins: (N_rays, B+1) interval edges (the reference passes coarse z
    mid-points); weights: (N_rays, B). Returns (N_rays, n_importance).
    det=True uses linspace(0,1) instead of uniform draws (used when
    perturb == 0, i.e. eval — rendering.py:185).

    ``impl`` selects how the four index-gathers (cdf/bins at below/above)
    are realized:

    - ``"onehot"``: batched one-hot MXU contractions (the 2026-08-16 win
      over take_along_axis gathers) — materializes (N, I, B+1) one-hot
      operands in HBM for the dots.
    - ``"maskreduce"``: masked max/min reduces over the same compare
      matrix — XLA fuses broadcast-compare-select-reduce into single
      fusions whose (N, I, B+1) intermediates never touch HBM. Requires
      ``bins`` ascending per ray (true whenever z_vals are sorted, i.e.
      perturb <= 1 — the caller gates on the same condition as
      merge_sorted_zvals); identical results to "onehot" under that
      precondition (tests/test_core.py pins equality).
    """
    n_rays, n_bins = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], -1)  # (N, B+1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_importance, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (n_rays, n_importance))
    else:
        # SORTED uniform draws via normalized exponential spacings: the
        # set of samples is distributed exactly as iid U[0,1) order
        # statistics (the reference's iid draws get sorted downstream
        # anyway — rendering.py:187), and ascending u makes z_fine
        # ascending, so the coarse+fine union needs only a log-depth
        # bitonic MERGE instead of a full sort.
        e = jax.random.exponential(
            key, (n_rays, n_importance + 1), dtype=cdf.dtype
        )
        cs = jnp.cumsum(e, -1)
        u = cs[:, :-1] / cs[:, -1:]

    if impl == "maskreduce":
        # searchsorted-free: with cdf non-decreasing and bins ascending,
        # x[inds-1] == max over the prefix {j: cdf[j] <= u} and
        # x[min(inds, B)] == min over the suffix {j: cdf[j] > u} (falling
        # back to x[B] when the suffix is empty, i.e. u >= cdf[B] — the
        # clip in the index path). Each select+reduce fuses to one XLA
        # fusion with no (N, I, B+1) HBM intermediate.
        le = cdf[:, None, :] <= u[:, :, None]          # (N, I, B+1)
        neg = jnp.asarray(-jnp.inf, cdf.dtype)
        pos = jnp.asarray(jnp.inf, cdf.dtype)

        def prefix_max(v):  # v: (N, B+1) -> (N, I)
            return jnp.max(jnp.where(le, v[:, None, :], neg), axis=-1)

        def suffix_min(v):
            r = jnp.min(jnp.where(le, pos, v[:, None, :]), axis=-1)
            return jnp.minimum(r, v[:, -1:])  # empty suffix -> v[B]

        cdf_below = prefix_max(cdf)
        cdf_above = suffix_min(cdf)
        bins_below = prefix_max(bins)
        bins_above = suffix_min(bins)

        denom = cdf_above - cdf_below
        denom = jnp.where(denom < eps, jnp.ones_like(denom), denom)
        t = (u - cdf_below) / denom
        return bins_below + t * (bins_above - bins_below)

    # Batched searchsorted(side='right'): count of cdf entries <= u. With
    # B ~ 64 bins a dense compare-all is a handful of VPU ops and avoids the
    # log-step gather chains a binary search would need on TPU.
    inds = jnp.sum(
        (cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32), axis=-1
    )
    below = jnp.clip(inds - 1, 0, None)
    above = jnp.clip(inds, None, n_bins)

    # gathers expressed as one-hot contractions — batched (I, J) x (J,)
    # matmuls ride the MXU; jnp.take_along_axis lowers to slow TPU gathers
    j = jnp.arange(n_bins + 1)
    oh_below = (below[:, :, None] == j).astype(cdf.dtype)   # (N, I, B+1)
    oh_above = (above[:, :, None] == j).astype(cdf.dtype)
    contract = lambda oh, v: jnp.einsum(  # noqa: E731
        "nij,nj->ni", oh, v, preferred_element_type=jnp.float32
    ).astype(cdf.dtype)
    cdf_below = contract(oh_below, cdf)
    cdf_above = contract(oh_above, cdf)
    bins_below = contract(oh_below, bins)
    bins_above = contract(oh_above, bins)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < eps, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def merge_sorted_zvals(z_coarse, z_fine, *, inputs_sorted: bool = True):
    """Sorted union of coarse and fine samples (rendering.py:187).

    When ``inputs_sorted`` both inputs are ascending (stratified bins are
    disjoint for perturb <= 1; ``sample_pdf`` draws sorted uniforms), so
    [z_coarse, reverse(z_fine)] is bitonic and a log2(S)-stage
    compare-exchange merge sorts it — a full sorting network is log^2(S)
    stages. Callers must pass ``inputs_sorted=False`` when z_coarse may be
    unsorted (perturb > 1 overshoots the mid-point intervals); that and
    non-power-of-2 totals fall back to an (unstable) lax.sort.
    """
    n = z_coarse.shape[-1] + z_fine.shape[-1]
    if inputs_sorted and n & (n - 1) == 0:
        x = jnp.concatenate([z_coarse, jnp.flip(z_fine, -1)], -1)
        k = n // 2
        while k >= 1:
            y = x.reshape(*x.shape[:-1], -1, 2, k)
            lo = jnp.minimum(y[..., 0, :], y[..., 1, :])
            hi = jnp.maximum(y[..., 0, :], y[..., 1, :])
            x = jnp.stack([lo, hi], axis=-2).reshape(*x.shape)
            k //= 2
        return x
    return jax.lax.sort(
        jnp.concatenate([z_coarse, z_fine], -1), dimension=-1,
        is_stable=False,
    )
