"""Sharded rendering and training over a ("data", "tile") mesh.

The scaling design (SURVEY.md §2.4, BASELINE.json north star):

  * Gaussians are sharded over the ``tile`` axis for preprocess — each
    device projects N/S Gaussians (the most FLOP-heavy per-Gaussian stage).
  * The compact screen-space attributes (uv, conic, color, depth, aabb —
    ~64 B/Gaussian, far smaller than raw params with 48 SH coeffs) are
    all-gathered over ICI.
  * Image tile-rows are sharded over the same ``tile`` axis: each device
    expands/sorts/blends only the instances that land in its strip of tile
    rows. Sort and blend cost divide by S; the only communication is the
    attribute all-gather (forward) and its transpose psum-scatter (backward).
  * Cameras batch-shard over the ``data`` axis; parameter gradients psum
    over it (inserted automatically by the shard_map transpose since params
    are replicated along ``data``).

The reference has no distributed path at all; this module is the new
first-class component the north star requires.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpusplat.config import RenderConfig
from tpusplat.ops.binning import bin_and_sort
from tpusplat.ops.preprocess import preprocess
from tpusplat.ops.rasterize_xla import rasterize_xla
from tpusplat.train.losses import gs_loss
from tpusplat.types import Camera, GaussianParams


def _rows_per_shard(height: int, cfg: RenderConfig, n_tile_shards: int) -> int:
    tiles_y = (height + cfg.tile_h - 1) // cfg.tile_h
    return -(-tiles_y // n_tile_shards)


def params_sharding(mesh: Mesh):
    """NamedShardings for GaussianParams: N-axis split over 'tile'."""
    return GaussianParams(
        means=NamedSharding(mesh, P("tile", None)),
        log_scales=NamedSharding(mesh, P("tile", None)),
        quats=NamedSharding(mesh, P("tile", None)),
        opacities=NamedSharding(mesh, P("tile")),
        sh=NamedSharding(mesh, P("tile", None, None)),
        alive=NamedSharding(mesh, P("tile")),
    )


def render_sharded(
    params: GaussianParams,
    cameras: Camera,
    cfg: RenderConfig,
    mesh: Mesh,
):
    """Render a batch of cameras over the mesh.

    Args:
      params: GaussianParams with leading axis divisible by the tile-axis
        size (shard evenly; pad with dead Gaussians if needed).
      cameras: batched Camera (leading axis divisible by the data-axis size).
    Returns:
      [B, H, W, 3] image, sharded (batch over 'data', rows over 'tile').
    """
    n_tile = mesh.shape["tile"]
    width, height = cameras.width, cameras.height
    nrows = _rows_per_shard(height, cfg, n_tile)
    n = params.num_gaussians
    cap_shard = cfg.instance_capacity(max(n // n_tile, 1))

    def body(p_shard: GaussianParams, cam: Camera):
        # [B_local] cameras; preprocess local Gaussian shard for each camera.
        pg_local = jax.vmap(lambda v, pr, cp, tx, ty: preprocess(
            p_shard,
            Camera(view=v, proj=pr, cam_pos=cp, tan_fovx=tx, tan_fovy=ty,
                   width=width, height=height),
            cfg,
        ))(cam.view, cam.proj, cam.cam_pos, cam.tan_fovx, cam.tan_fovy)

        # Exchange compact attributes so every shard sees all Gaussians.
        pg_full = jax.tree_util.tree_map(
            lambda x: lax.all_gather(x, "tile", axis=1, tiled=True), pg_local
        )

        row0 = lax.axis_index("tile") * nrows

        def render_one(pg):
            binned = bin_and_sort(pg, width, height, cfg, row0, nrows, cap_shard)
            if cfg.use_pallas:
                from tpusplat.ops.rasterize_pallas import rasterize_pallas

                img, aux = rasterize_pallas(pg, binned, width, height, cfg, row0, nrows)
            else:
                img, aux = rasterize_xla(pg, binned, width, height, cfg, row0, nrows)
            # tile_overflow: instances silently dropped past max_per_tile in
            # the XLA path (the Pallas kernel streams true ranges -> 0). Must
            # be surfaced, not swallowed: a dense tile losing contributions
            # with no signal corrupts training undetectably.
            return img, aux["capacity_overflow"], aux["tile_overflow"]

        # lax.map (not vmap): pallas_call doesn't batch, and the per-camera
        # work is large enough that sequencing costs nothing.
        strip, overflow, tile_ovf = lax.map(render_one, pg_full)
        return strip, jnp.sum(overflow)[None], jnp.sum(tile_ovf)[None]

    strips, overflow, tile_ovf = jax.shard_map(
        body,
        mesh=mesh,
        # The rasterizer's scan carries are created inside the mapped body
        # (zeros/ones), which the VMA checker would flag; correctness is
        # covered by tests against the single-device path.
        check_vma=False,
        in_specs=(
            GaussianParams(
                means=P("tile", None),
                log_scales=P("tile", None),
                quats=P("tile", None),
                opacities=P("tile"),
                sh=P("tile", None, None),
                alive=P("tile"),
            ),
            Camera(
                view=P("data", None, None),
                proj=P("data", None, None),
                cam_pos=P("data", None),
                tan_fovx=P("data"),
                tan_fovy=P("data"),
                width=width,
                height=height,
            ),
        ),
        out_specs=(
            P("data", "tile", None, None),
            P(("data", "tile")),
            P(("data", "tile")),
        ),
    )(params, cameras)
    # strips: [B, S*nrows*tile_h, W, 3]; crop the tile padding.
    return strips[:, :height], overflow, tile_ovf


@partial(
    jax.jit,
    static_argnames=("cfg", "optimizer", "mesh", "ssim_weight"),
    donate_argnames=("state",),
)
def sharded_train_step(
    state,
    cameras: Camera,
    targets: jax.Array,
    cfg: RenderConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    ssim_weight: float = 0.2,
):
    """One optimizer step on a sharded camera batch. ``state`` is a
    TrainState whose params are sharded per ``params_sharding(mesh)``."""

    from tpusplat.train.step import merge_trainable, split_trainable

    trainable, alive = split_trainable(state.params)

    def loss_fn(tr):
        img, overflow, tile_ovf = render_sharded(
            merge_trainable(tr, alive), cameras, cfg, mesh
        )
        return gs_loss(img, targets, ssim_weight), (overflow, tile_ovf)

    (loss, (overflow, tile_ovf)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(trainable)
    updates, opt_state = optimizer.update(grads, state.opt_state, trainable)
    params = merge_trainable(optax.apply_updates(trainable, updates), alive)
    # In-graph overflow gate (see train/step.py): never apply a step whose
    # gradients were computed from a truncated instance buffer — the host
    # regrows capacity and retries from the unchanged (donated-in-place)
    # state, matching the reference's retry semantics
    # (src/Renderer.cpp:541-563).
    ok = jnp.sum(overflow) == 0
    keep = lambda new, old: jax.tree_util.tree_map(  # noqa: E731
        lambda a, b: jnp.where(ok, a, b), new, old
    )
    state = dataclasses.replace(
        state,
        params=keep(params, state.params),
        opt_state=keep(opt_state, state.opt_state),
        step=state.step + jnp.where(ok, 1, 0),
    )
    return state, dict(
        loss=loss, capacity_overflow=overflow, tile_overflow=tile_ovf
    )
