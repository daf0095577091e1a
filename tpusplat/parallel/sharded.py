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


def _shard_render_body(
    p_shard: GaussianParams,
    cam: Camera,
    cfg: RenderConfig,
    width: int,
    height: int,
    nrows: int,
    cap_shard: int,
):
    """Per-shard render body (runs INSIDE shard_map over ("data", "tile")).

    Preprocesses the local Gaussian shard for each local camera, exchanges
    the compact screen-space attributes over ``tile``, and renders this
    shard's strip of tile rows. Two gradient-exchange strategies
    (``cfg.grad_exchange``):

      * "dense" (default): plain all_gather whose transpose psum-scatters
        DENSE [N, ...] attribute gradients back to the owning shards.
      * "compact" (when the Pallas strip-compaction prerequisites hold):
        parallel/compact_grad.exchange_render — identical forward, but
        backward reduces gradients only over the strip's compacted
        Gaussian stream and ships compact (id, grad-row) buckets to owners
        via all_to_all; no chip materializes dense [N] gradients. Measured
        slower than dense on ICI (see config.grad_exchange).

    Returns (strips [B_local, nrows*tile_h, width, 3], counters: dict of
    [B_local] int32 — capacity/tile/gauss/a2a overflow; each channel has a
    distinct recovery, see config.py).
    """
    # [B_local] cameras; preprocess local Gaussian shard for each camera.
    pg_local = jax.vmap(lambda v, pr, cp, tx, ty: preprocess(
        p_shard,
        Camera(view=v, proj=pr, cam_pos=cp, tan_fovx=tx, tan_fovy=ty,
               width=width, height=height),
        cfg,
    ))(cam.view, cam.proj, cam.cam_pos, cam.tan_fovx, cam.tan_fovy)

    row0 = lax.axis_index("tile") * nrows
    tiles_x, tiles_y = cfg.tile_grid(width, height)
    n_local = p_shard.num_gaussians
    n_shards = lax.axis_size("tile")
    n_total = n_local * n_shards
    gcap = cfg.strip_gauss_capacity(n_total, nrows, tiles_y)

    from tpusplat.ops.binning import pallas_emission_ok

    compact = (
        cfg.grad_exchange == "compact"
        and gcap is not None
        and n_shards > 1
        and nrows < tiles_y
        and pallas_emission_ok(cfg, n_total, cap_shard, tiles_x, tiles_y)
    )
    if compact:
        from tpusplat.parallel.compact_grad import (
            CompactStatic, exchange_render, pack_exchange_table,
        )

        table_local = jax.vmap(pack_exchange_table)(pg_local)
        st = CompactStatic(
            cfg=cfg, width=width, height=height, nrows=nrows,
            cap_shard=cap_shard, gcap=gcap, n_total=n_total,
            n_local=n_local, n_shards=n_shards, axis="tile",
        )
        return exchange_render(table_local, st)

    # Dense exchange: all_gather the full attribute pytree.
    pg_full = jax.tree_util.tree_map(
        lambda x: lax.all_gather(x, "tile", axis=1, tiled=True), pg_local
    )

    def render_one(pg):
        binned = bin_and_sort(pg, width, height, cfg, row0, nrows, cap_shard,
                              gauss_capacity=gcap)
        if cfg.use_pallas:
            from tpusplat.ops.rasterize_pallas import rasterize_pallas

            img, aux = rasterize_pallas(pg, binned, width, height, cfg, row0, nrows)
        else:
            img, aux = rasterize_xla(pg, binned, width, height, cfg, row0, nrows)
        # tile_overflow: instances silently dropped past max_per_tile in
        # the XLA path (the Pallas kernel streams true ranges -> 0). Must
        # be surfaced, not swallowed: a dense tile losing contributions
        # with no signal corrupts training undetectably. gauss_overflow is
        # the strip-compaction cap (separate channel: its recovery is
        # growing strip_gauss_mult, not the instance capacity).
        return img, dict(
            capacity_overflow=aux["capacity_overflow"],
            tile_overflow=aux["tile_overflow"],
            gauss_overflow=aux["gauss_overflow"],
            a2a_overflow=jnp.zeros((), jnp.int32),
        )

    # lax.map (not vmap): pallas_call doesn't batch, and the per-camera
    # work is large enough that sequencing costs nothing.
    return lax.map(render_one, pg_full)


_SSIM_HALO = 5  # 11x11 window -> 5 context rows each side


def _strip_loss_local(
    strips: jax.Array,
    targets: jax.Array,
    row0_px,
    total_rows_px: int,
    height: int,
    width: int,
    ssim_weight: float,
) -> jax.Array:
    """This shard's exact contribution to the full-image gs_loss.

    The L1 term is pointwise; the SSIM term needs _SSIM_HALO rows of context
    across strip boundaries, exchanged with two ``ppermute`` steps (the
    rendering analogue of ring-attention halo exchange — SURVEY.md §5
    long-context row). Rows past the true image height are masked to zero,
    which reproduces the full-image SAME zero padding exactly; shards at the
    chain ends receive ppermute's zero fill, which IS the image-boundary
    padding. Summing psum(loss_local) over ("data", "tile") and adding the
    ``ssim_weight`` constant therefore equals gs_loss on the full gathered
    image up to fp reassociation.
    """
    from tpusplat.train.losses import ssim_map

    b, sh, _, c = strips.shape
    img = strips[:, :, :width, :]
    rows_abs = row0_px + jnp.arange(sh)
    valid = (rows_abs < height).astype(img.dtype)  # [sh]
    img = img * valid[None, :, None, None]

    s_tile = lax.axis_size("tile")
    down = [(j, j + 1) for j in range(s_tile - 1)]  # my bottom rows -> next's top halo
    up = [(j, j - 1) for j in range(1, s_tile)]  # my top rows -> prev's bottom halo
    top_halo = lax.ppermute(img[:, -_SSIM_HALO:], "tile", down)
    bot_halo = lax.ppermute(img[:, :_SSIM_HALO], "tile", up)
    ext_img = jnp.concatenate([top_halo, img, bot_halo], axis=1)

    # Target context from the full-height target: rows [row0-5, row0+sh+5),
    # zero-padded outside [0, height) — pad so the dynamic slice stays in
    # range for every shard (row0 is traced via axis_index).
    tpad = jnp.pad(
        targets,
        ((0, 0), (_SSIM_HALO, total_rows_px + 2 * _SSIM_HALO - height), (0, 0), (0, 0)),
    )
    ext_tgt = lax.dynamic_slice_in_dim(tpad, row0_px, sh + 2 * _SSIM_HALO, axis=1)

    l1_sum = jnp.sum(jnp.abs(img - ext_tgt[:, _SSIM_HALO:_SSIM_HALO + sh]))
    smap = ssim_map(ext_img, ext_tgt)[:, _SSIM_HALO:_SSIM_HALO + sh]
    ssim_sum = jnp.sum(smap * valid[None, :, None, None])

    # Full batch size = data_size * B_local.
    n_total = lax.axis_size("data") * b * height * width * c
    return ((1.0 - ssim_weight) * l1_sum - ssim_weight * ssim_sum) / n_total


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
      ([B, H, W, 3] image sharded (batch over 'data', rows over 'tile'),
      counters dict of [n_devices] int32 overflow channels).
    """
    n_tile = mesh.shape["tile"]
    width, height = cameras.width, cameras.height
    nrows = _rows_per_shard(height, cfg, n_tile)
    n = params.num_gaussians
    cap_shard = cfg.instance_capacity(max(n // n_tile, 1))

    def body(p_shard: GaussianParams, cam: Camera):
        strip, counters = _shard_render_body(
            p_shard, cam, cfg, width, height, nrows, cap_shard
        )
        return strip, jax.tree_util.tree_map(
            lambda x: jnp.sum(x)[None], counters)

    strips, counters = jax.shard_map(
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
            dict(
                capacity_overflow=P(("data", "tile")),
                tile_overflow=P(("data", "tile")),
                gauss_overflow=P(("data", "tile")),
                a2a_overflow=P(("data", "tile")),
            ),
        ),
    )(params, cameras)
    # strips: [B, S*nrows*tile_h, W, 3]; crop the tile padding.
    return strips[:, :height], counters


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
        img, counters = render_sharded(
            merge_trainable(tr, alive), cameras, cfg, mesh
        )
        return gs_loss(img, targets, ssim_weight), counters

    (loss, counters), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(trainable)
    updates, opt_state = optimizer.update(grads, state.opt_state, trainable)
    params = merge_trainable(optax.apply_updates(trainable, updates), alive)
    # In-graph overflow gate (see train/step.py): never apply a step whose
    # gradients were computed from a truncated instance buffer, compacted
    # stream, or exchange bucket — the host regrows the right capacity
    # (each channel names its own recovery, config.py) and retries from
    # the unchanged (donated-in-place) state, matching the reference's
    # retry semantics (src/Renderer.cpp:541-563).
    # Every truncation channel gates the update — including tile_overflow
    # (XLA-rasterizer per-tile cap): a dense tile losing contributions
    # corrupts gradients exactly like instance-capacity truncation.
    ok = (jnp.sum(counters["capacity_overflow"])
          + jnp.sum(counters["gauss_overflow"])
          + jnp.sum(counters["a2a_overflow"])
          + jnp.sum(counters["tile_overflow"])) == 0
    keep = lambda new, old: jax.tree_util.tree_map(  # noqa: E731
        lambda a, b: jnp.where(ok, a, b), new, old
    )
    state = dataclasses.replace(
        state,
        params=keep(params, state.params),
        opt_state=keep(opt_state, state.opt_state),
        step=state.step + jnp.where(ok, 1, 0),
    )
    return state, dict(loss=loss, **counters)


@partial(
    jax.jit,
    static_argnames=("cfg", "optimizer", "mesh", "ssim_weight", "grad_reduce"),
    donate_argnames=("state",),
)
def sharded_train_step_overlap(
    state,
    cameras: Camera,
    targets: jax.Array,
    cfg: RenderConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    ssim_weight: float = 0.2,
    grad_reduce: str = "ring",
):
    """Overlap-ready sharded training step.

    Differences from :func:`sharded_train_step` (the monolithic baseline):

      * value_and_grad runs INSIDE the shard_map body, so the loss is
        computed per strip with exact halo-exchange SSIM
        (:func:`_strip_loss_local`) instead of gathering the full image —
        the image all-gather and its backward scatter disappear entirely.
      * The parameter-gradient reduction over the ``data`` axis is an
        explicit ppermute ring (``grad_reduce="ring"``,
        collectives.ring_all_reduce) in 2(S-1) independent steps that XLA's
        latency-hiding scheduler can overlap with the remaining backward
        compute, instead of one fused trailing psum (``grad_reduce="psum"``
        keeps the fused collective for A/B comparison). The tile-axis
        reduction stays the all_gather transpose (psum-scatter) either way.

    Semantics match sharded_train_step exactly (same loss, same update,
    same overflow no-op gate) up to fp reassociation of the reductions.
    """
    from tpusplat.parallel.collectives import ring_all_reduce
    from tpusplat.train.step import merge_trainable, split_trainable

    n_tile = mesh.shape["tile"]
    width, height = cameras.width, cameras.height
    nrows = _rows_per_shard(height, cfg, n_tile)
    n = state.params.num_gaussians
    cap_shard = cfg.instance_capacity(max(n // n_tile, 1))
    total_rows_px = n_tile * nrows * cfg.tile_h

    trainable, alive = split_trainable(state.params)

    def body(tr, alv, cam, tgt):
        row0_px = lax.axis_index("tile") * nrows * cfg.tile_h

        def loss_fn(tr):
            strips, counters = _shard_render_body(
                merge_trainable(tr, alv), cam, cfg, width, height, nrows,
                cap_shard,
            )
            loss_local = _strip_loss_local(
                strips, tgt, row0_px, total_rows_px, height, width, ssim_weight
            )
            return loss_local, jax.tree_util.tree_map(jnp.sum, counters)

        (loss_local, counters), g = jax.value_and_grad(
            loss_fn, has_aux=True
        )(tr)
        # g is already reduced over 'tile' (all_gather transpose inside
        # loss_fn); reduce over 'data' with the overlap-ready ring.
        if grad_reduce == "ring":
            g = ring_all_reduce(g, "data")
        else:
            g = jax.tree_util.tree_map(lambda x: lax.psum(x, "data"), g)
        loss = lax.psum(loss_local, ("data", "tile")) + ssim_weight
        counters = jax.tree_util.tree_map(
            lambda x: lax.psum(x, ("data", "tile")), counters)
        return loss, counters, g

    pspec = {
        "means": P("tile", None),
        "log_scales": P("tile", None),
        "quats": P("tile", None),
        "opacities": P("tile"),
        "sh": P("tile", None, None),
    }
    loss, counters, grads = jax.shard_map(
        body,
        mesh=mesh,
        check_vma=False,
        in_specs=(
            pspec,
            P("tile"),
            Camera(
                view=P("data", None, None),
                proj=P("data", None, None),
                cam_pos=P("data", None),
                tan_fovx=P("data"),
                tan_fovy=P("data"),
                width=width,
                height=height,
            ),
            P("data", None, None, None),
        ),
        out_specs=(
            P(),
            dict(capacity_overflow=P(), tile_overflow=P(),
                 gauss_overflow=P(), a2a_overflow=P()),
            pspec,
        ),
    )(trainable, alive, cameras, targets)

    updates, opt_state = optimizer.update(grads, state.opt_state, trainable)
    params = merge_trainable(optax.apply_updates(trainable, updates), alive)
    ok = (counters["capacity_overflow"] + counters["gauss_overflow"]
          + counters["a2a_overflow"] + counters["tile_overflow"]) == 0
    keep = lambda new, old: jax.tree_util.tree_map(  # noqa: E731
        lambda a, b: jnp.where(ok, a, b), new, old
    )
    state = dataclasses.replace(
        state,
        params=keep(params, state.params),
        opt_state=keep(opt_state, state.opt_state),
        step=state.step + jnp.where(ok, 1, 0),
    )
    return state, dict(loss=loss, **counters)
