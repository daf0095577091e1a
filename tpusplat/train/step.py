"""Training step: Adam on raw Gaussian parameters.

Per-parameter learning rates follow the original 3DGS recipe (means get an
exponentially-decaying lr scaled by scene extent; opacity/scales/rotation/SH
get fixed lrs). The reference viewer has no training at all (README.md:88);
this supplies it, with densification handled in train/densify.py under a
static capacity (alive-mask) so shapes never change under jit.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from tpusplat.config import RenderConfig
from tpusplat.render import render_stages
from tpusplat.train.losses import gs_loss
from tpusplat.types import Camera, GaussianParams

TRAINABLE = ("means", "log_scales", "quats", "opacities", "sh")


def split_trainable(params: GaussianParams):
    """(dict of trainable leaves, alive mask). Gradients/optimizer state run
    on the dict so the bool mask never enters autodiff."""
    return {f: getattr(params, f) for f in TRAINABLE}, params.alive


def merge_trainable(trainable: dict, alive) -> GaussianParams:
    return GaussianParams(alive=alive, **trainable)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: GaussianParams
    opt_state: Any
    step: jax.Array
    # Densification statistics (accumulated over steps; see densify.py):
    grad_accum: jax.Array  # [N] sum of ||d(loss)/d(uv-proxy)|| ~ mean-2D grads
    grad_count: jax.Array  # [N] number of times each Gaussian was visible
    max_radii: jax.Array  # [N] max observed screen radius


def make_optimizer(
    means_lr: float = 1.6e-4,
    means_lr_final: float = 1.6e-6,
    means_lr_max_steps: int = 30_000,
    scales_lr: float = 5e-3,
    quats_lr: float = 1e-3,
    opacities_lr: float = 5e-2,
    sh_lr: float = 2.5e-3,
    scene_extent: float = 1.0,
) -> optax.GradientTransformation:
    means_schedule = optax.exponential_decay(
        init_value=means_lr * scene_extent,
        transition_steps=means_lr_max_steps,
        decay_rate=means_lr_final / means_lr,
        end_value=means_lr_final * scene_extent,
    )
    return optax.multi_transform(
        {
            "means": optax.adam(means_schedule, eps=1e-15),
            "log_scales": optax.adam(scales_lr, eps=1e-15),
            "quats": optax.adam(quats_lr, eps=1e-15),
            "opacities": optax.adam(opacities_lr, eps=1e-15),
            "sh": optax.adam(sh_lr, eps=1e-15),
        },
        {f: f for f in TRAINABLE},
    )


def create_train_state(
    params: GaussianParams, optimizer: optax.GradientTransformation | None = None
) -> TrainState:
    if optimizer is None:
        optimizer = make_optimizer()
    n = params.num_gaussians
    return TrainState(
        params=params,
        opt_state=optimizer.init(split_trainable(params)[0]),
        step=jnp.zeros((), jnp.int32),
        grad_accum=jnp.zeros((n,), jnp.float32),
        grad_count=jnp.zeros((n,), jnp.float32),
        max_radii=jnp.zeros((n,), jnp.float32),
    )


@partial(jax.jit, static_argnames=("cfg", "optimizer", "ssim_weight"))
def train_step(
    state: TrainState,
    camera: Camera,
    target: jax.Array,
    cfg: RenderConfig,
    optimizer: optax.GradientTransformation,
    ssim_weight: float = 0.2,
):
    """One optimization step on a single camera. Returns (state, metrics)."""
    trainable, alive = split_trainable(state.params)

    def loss_fn(tr):
        img, aux = render_stages(merge_trainable(tr, alive), camera, cfg)
        return gs_loss(img, target, ssim_weight), aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
    updates, opt_state = optimizer.update(grads, state.opt_state, trainable)
    params = merge_trainable(optax.apply_updates(trainable, updates), alive)

    # Exact overflow recovery, part 1 (in-graph): a step whose instance
    # buffer overflowed computed gradients from silently dropped instances.
    # The reference never applies such a frame — it regrows the sort buffer
    # and retries (src/Renderer.cpp:541-563, goto at 383). Here the update is
    # gated to a no-op so the host loop can regrow capacity and retry from an
    # unchanged state, however lazily it polls the overflow counter.
    ok = (aux["capacity_overflow"] + aux["gauss_overflow"]
          + aux["tile_overflow"]) == 0
    keep = lambda new, old: jax.tree_util.tree_map(  # noqa: E731
        lambda a, b: jnp.where(ok, a, b), new, old
    )
    params = keep(params, state.params)
    opt_state = keep(opt_state, state.opt_state)

    # Densification statistics: screen-space positional gradient magnitude
    # (d loss / d means projected through uv is the 3DGS criterion; we use
    # the world-mean gradient norm scaled by depth as a cheap proxy that
    # needs no extra VJP plumbing).
    gnorm = jnp.linalg.norm(grads["means"], axis=-1)
    visible = aux["visible"]
    radius = aux["radius"]
    if visible.ndim > 1:  # batched cameras: reduce over the batch axis
        visible = visible.any(axis=0)
        radius = radius.max(axis=0)
    metrics = dict(
        loss=loss,
        num_instances=aux["num_instances"],
        capacity_overflow=aux["capacity_overflow"],
        # Strip-compaction overflow (0 outside tile-sharded strip mode):
        # reported separately so regrow logic grows strip_gauss_mult, not
        # the instance capacity (ADVICE r4).
        gauss_overflow=aux["gauss_overflow"],
        # XLA-path per-tile truncation (Pallas streams true ranges -> 0);
        # gates the update like every other truncation channel, recovery
        # is max_per_tile (config.regrow).
        tile_overflow=aux["tile_overflow"],
    )
    state = TrainState(
        params=params,
        opt_state=opt_state,
        step=state.step + jnp.where(ok, 1, 0),
        grad_accum=state.grad_accum + jnp.where(ok, gnorm, 0.0),
        grad_count=state.grad_count
        + jnp.where(ok, visible.astype(jnp.float32), 0.0),
        max_radii=jnp.where(
            ok, jnp.maximum(state.max_radii, radius), state.max_radii
        ),
    )
    return state, metrics
