"""Adaptive density control: clone / split / prune under a static capacity.

The original 3DGS densification with a TPU-native twist: the Gaussian count
never changes — the parameter arrays have a fixed capacity N and an ``alive``
mask (SURVEY.md §7 hard part 1: no dynamic shapes under jit). Dead slots
render as fully transparent; densification *allocates* free slots via a
rank-and-scatter (sort-based, no host round trip), pruning frees them.

Recipe (matching upstream 3DGS semantics):
  * candidates: average positional-gradient norm over the accumulation
    window >= grad_threshold, alive only;
  * clone (scale small): copy the Gaussian into a free slot;
  * split (scale large): draw two samples from the Gaussian itself, scale
    divided by 1.6 — one replaces the source slot, one takes a free slot;
  * free slots are granted to candidates in decreasing gradient order;
  * prune: opacity below min_opacity (plus optional screen/world size caps);
  * Adam moments of every touched slot are zeroed (fresh start, as upstream).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tpusplat.ops.activations import normalize_quat
from tpusplat.train.step import TrainState
from tpusplat.types import GaussianParams


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    grad_threshold: float = 2e-4
    percent_dense: float = 0.01
    min_opacity: float = 0.005
    split_scale_div: float = 1.6
    max_screen_radius: float = 0.0  # 0 disables screen-size pruning
    max_world_scale: float = 0.1  # fraction of scene extent; 0 disables


def _rot_apply(quats, v):
    """Rotate [N,3] vectors by [N,4] (w,x,y,z) quaternions."""
    q = normalize_quat(quats)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    vx, vy, vz = v[:, 0], v[:, 1], v[:, 2]
    # R @ v with the standard rotation matrix
    rx = (1 - 2 * (y * y + z * z)) * vx + 2 * (x * y - z * w) * vy + 2 * (x * z + y * w) * vz
    ry = 2 * (x * y + z * w) * vx + (1 - 2 * (x * x + z * z)) * vy + 2 * (y * z - x * w) * vz
    rz = 2 * (x * z - y * w) * vx + 2 * (y * z + x * w) * vy + (1 - 2 * (x * x + y * y)) * vz
    return jnp.stack([rx, ry, rz], axis=-1)


def _zero_rows(tree, mask):
    """Zero leading-dim rows of every [N, ...] leaf where mask is True."""
    n = mask.shape[0]

    def z(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == n and x.dtype != jnp.bool_:
            return jnp.where(mask.reshape((n,) + (1,) * (x.ndim - 1)), 0, x)
        return x

    return jax.tree_util.tree_map(z, tree)


def densify_and_prune(
    state: TrainState,
    key: jax.Array,
    dcfg: DensifyConfig,
    scene_extent: float,
) -> TrainState:
    """One densification round. Shapes are static; jit-compatible."""
    params = state.params
    n = params.num_gaussians
    alive = params.alive

    avg_grad = state.grad_accum / jnp.maximum(state.grad_count, 1.0)
    scales = jnp.exp(params.log_scales)
    max_scale = scales.max(axis=-1)

    grad_ok = (avg_grad >= dcfg.grad_threshold) & alive
    is_large = max_scale > dcfg.percent_dense * scene_extent
    cand = grad_ok
    split_m = grad_ok & is_large

    # Rank candidates by gradient, grant free slots to the top ones.
    free = ~alive
    n_free = jnp.sum(free)
    score = jnp.where(cand, avg_grad, -jnp.inf)
    order = jnp.argsort(-score)  # candidate slots, best first
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    granted = cand & (rank < n_free)

    # j-th granted candidate (by rank) gets the j-th free slot (ascending).
    free_list = jnp.argsort(~free, stable=True)  # free slot ids first
    target = jnp.where(granted, free_list[jnp.minimum(rank, n - 1)], n)  # n = drop

    # New-slot values: clone copies the source; split samples from the
    # Gaussian and shrinks it.
    noise = jax.random.normal(key, (n, 3), dtype=params.means.dtype)
    sample1 = params.means + _rot_apply(params.quats, noise * scales)
    noise2 = jax.random.normal(jax.random.fold_in(key, 1), (n, 3), params.means.dtype)
    sample2 = params.means + _rot_apply(params.quats, noise2 * scales)
    split_log_scales = params.log_scales - jnp.log(dcfg.split_scale_div)

    new_means = jnp.where(split_m[:, None], sample1, params.means)
    new_log_scales = jnp.where(split_m[:, None], split_log_scales, params.log_scales)

    # Scatter new Gaussians into their granted slots (index n drops).
    means = params.means.at[target].set(new_means, mode="drop")
    log_scales = params.log_scales.at[target].set(new_log_scales, mode="drop")
    quats = params.quats.at[target].set(params.quats, mode="drop")
    opacities = params.opacities.at[target].set(params.opacities, mode="drop")
    sh = params.sh.at[target].set(params.sh, mode="drop")
    alive_new = alive.at[target].set(True, mode="drop")

    # Split sources move to their second sample and shrink in place.
    src_split = split_m & granted
    means = jnp.where(src_split[:, None], sample2, means)
    log_scales = jnp.where(src_split[:, None], split_log_scales, log_scales)

    # Prune.
    opacity_act = jax.nn.sigmoid(opacities)
    prune = opacity_act < dcfg.min_opacity
    if dcfg.max_world_scale > 0:
        prune = prune | (jnp.exp(log_scales).max(-1) > dcfg.max_world_scale * scene_extent)
    if dcfg.max_screen_radius > 0:
        prune = prune | (state.max_radii > dcfg.max_screen_radius)
    alive_new = alive_new & ~prune

    new_params = GaussianParams(
        means=means, log_scales=log_scales, quats=quats,
        opacities=opacities, sh=sh, alive=alive_new,
    )

    # Fresh Adam moments for touched or dead slots.
    touched = src_split | ~alive_new
    touched = touched.at[target].set(True, mode="drop")
    opt_state = _zero_rows(state.opt_state, touched)

    return TrainState(
        params=new_params,
        opt_state=opt_state,
        step=state.step,
        grad_accum=jnp.zeros_like(state.grad_accum),
        grad_count=jnp.zeros_like(state.grad_count),
        max_radii=jnp.zeros_like(state.max_radii),
    )


def reset_opacity(state: TrainState, ceiling: float = 0.01) -> TrainState:
    """Clamp all opacities to at most ``ceiling`` (upstream 3DGS does this
    every 3000 steps to let pruning reconsider saturated Gaussians)."""
    raw_ceiling = jnp.log(ceiling / (1.0 - ceiling))
    params = dataclasses.replace(
        state.params, opacities=jnp.minimum(state.params.opacities, raw_ceiling)
    )
    return dataclasses.replace(state, params=params)
