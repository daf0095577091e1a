"""Tile rasterization in pure XLA ops (differentiable reference path).

The TPU-native re-formulation of K8 (``render.comp:30-99``). The reference
walks each pixel's sorted instance list sequentially, accumulating
transmittance T and breaking when T would drop below 1e-4. Sequential
per-element loops are poison on TPU, so we use the algebraic identity:

    c(p) = sum_g  color_g * alpha_g(p) * T_excl_g(p)
    T_excl_g(p) = prod_{j < g, pass_j(p)} (1 - alpha_j(p))

with the termination rule expressed as a mask: Gaussian g contributes iff
``T_incl_g(p) = T_excl_g * (1 - alpha_g) >= t_min`` (the reference breaks
*before* adding the Gaussian that would cross the threshold,
``render.comp:81-88``; T_incl is non-increasing so the mask is monotone,
which makes the masked sum exactly equal to the sequential loop). The
cumulative products vectorize over a whole chunk of Gaussians at once.

Skip rules reproduced from ``render.comp:68-80``: pass requires power <= 0
and alpha = min(0.99, opacity * exp(power)) >= 1/255; skipped Gaussians
multiply T by 1.

This path materializes [tiles, K] gathers, so it is the correctness/medium
scale implementation; the Pallas kernel (ops/rasterize_pallas.py) streams
instances for production scale. Both share `blend_chunk` semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tpusplat.config import RenderConfig
from tpusplat.ops.binning import BinnedInstances
from tpusplat.ops.preprocess import ProcessedGaussians


def _blend_tile_chunked(
    uv, conic, opacity, color, valid, px, py, cfg: RenderConfig
):
    """Blend K depth-ordered Gaussians into P pixels.

    Args (chunk axes): uv [K,2], conic [K,3], opacity [K], color [K,3],
    valid [K] bool; px, py [P] pixel centers.
    Returns (rgb [P,3], T_final [P]).
    """
    k = uv.shape[0]
    p = px.shape[0]
    ck = cfg.gauss_chunk
    nchunks = -(-k // ck)
    pad = nchunks * ck - k
    if pad:
        uv = jnp.pad(uv, ((0, pad), (0, 0)))
        conic = jnp.pad(conic, ((0, pad), (0, 0)))
        opacity = jnp.pad(opacity, ((0, pad),))
        color = jnp.pad(color, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, pad),))

    uv_c = uv.reshape(nchunks, ck, 2)
    conic_c = conic.reshape(nchunks, ck, 3)
    op_c = opacity.reshape(nchunks, ck)
    col_c = color.reshape(nchunks, ck, 3)
    val_c = valid.reshape(nchunks, ck)

    def chunk_step(carry, chunk):
        c_acc, t_acc = carry  # [P,3], [P]
        uvk, conick, opk, colk, valk = chunk
        dx = uvk[:, 0:1] - px[None, :]  # [ck, P]
        dy = uvk[:, 1:2] - py[None, :]
        a, b, cc = conick[:, 0:1], conick[:, 1:2], conick[:, 2:3]
        power = -0.5 * (a * dx * dx + cc * dy * dy) - b * dx * dy
        alpha = jnp.minimum(cfg.alpha_max, opk[:, None] * jnp.exp(power))
        ok = valk[:, None] & (power <= 0.0) & (alpha >= cfg.alpha_min)
        f = jnp.where(ok, 1.0 - alpha, 1.0)
        t_incl = t_acc[None, :] * jnp.cumprod(f, axis=0)
        t_excl = t_incl / f
        contrib = ok & (t_incl >= cfg.t_min)
        w = jnp.where(contrib, alpha * t_excl, 0.0)  # [ck, P]
        # highest precision: default f32 einsum would route through bf16 MXU
        # passes on TPU and cost ~3 decimal digits of image parity
        c_acc = c_acc + jnp.einsum("kp,kc->pc", w, colk, precision="highest")
        return (c_acc, t_incl[-1]), None

    init = (jnp.zeros((p, 3), jnp.float32), jnp.ones((p,), jnp.float32))
    (rgb, t_fin), _ = lax.scan(chunk_step, init, (uv_c, conic_c, op_c, col_c, val_c))
    return rgb, t_fin


def rasterize_xla(
    pg: ProcessedGaussians,
    binned: BinnedInstances,
    width: int,
    height: int,
    cfg: RenderConfig,
    row0=0,
    nrows: int | None = None,
):
    """Render the full image, or the strip of ``nrows`` tile rows starting
    at (possibly traced) row ``row0``. Returns (rgb [H,W,3] or
    [nrows*tile_h, W, 3], aux dict)."""
    tiles_x, tiles_y = cfg.tile_grid(width, height)
    strip = nrows is not None
    if not strip:
        nrows = tiles_y
    num_tiles = tiles_x * nrows
    tw, th = cfg.tile_w, cfg.tile_h
    npx = tw * th
    kcap = cfg.max_per_tile
    n = pg.uv.shape[0]
    cap = binned.gauss_id.shape[0]

    counts = binned.tile_end - binned.tile_start
    tile_overflow = jnp.sum(jnp.maximum(counts - kcap, 0))

    # Pixel-center offsets within a tile (row-major y, x).
    ly = lax.iota(jnp.int32, npx) // tw
    lx = lax.iota(jnp.int32, npx) % tw

    def tile_batch(tile_ids):  # [B]
        start = binned.tile_start[tile_ids]
        count = jnp.minimum(counts[tile_ids], kcap)
        ks = lax.iota(jnp.int32, kcap)
        idx = jnp.minimum(start[:, None] + ks[None, :], cap - 1)
        validk = ks[None, :] < count[:, None]  # [B, K]
        gid = jnp.minimum(binned.gauss_id[idx], n - 1)  # [B, K]

        tx = (tile_ids % tiles_x).astype(jnp.float32)
        ty = (row0 + tile_ids // tiles_x).astype(jnp.float32)
        px = tx[:, None] * tw + lx[None, :].astype(jnp.float32)  # [B, P]
        py = ty[:, None] * th + ly[None, :].astype(jnp.float32)

        def one(gid_k, valid_k, px_t, py_t):
            return _blend_tile_chunked(
                pg.uv[gid_k],
                pg.conic[gid_k],
                pg.opacity[gid_k],
                pg.color[gid_k],
                valid_k,
                px_t,
                py_t,
                cfg,
            )

        return jax.vmap(one)(gid, validk, px, py)

    tb = cfg.tile_chunk
    nbatches = -(-num_tiles // tb)
    tiles_padded = nbatches * tb
    all_tiles = jnp.minimum(lax.iota(jnp.int32, tiles_padded), num_tiles - 1)
    # remat: without it the blend scan saves per-chunk [tiles, K, P] residuals
    # for backward (tens of GB at production scale); recomputing the blend in
    # the backward pass is the same recompute-from-start strategy the Pallas
    # backward kernel uses.
    rgb_tiles, t_tiles = lax.map(jax.checkpoint(tile_batch), all_tiles.reshape(nbatches, tb))
    rgb_tiles = rgb_tiles.reshape(tiles_padded, npx, 3)[:num_tiles]
    t_tiles = t_tiles.reshape(tiles_padded, npx)[:num_tiles]

    # [T, P, 3] -> [H_pad, W_pad, 3] -> crop (height only in full-image mode;
    # strip mode keeps all nrows*th rows so shard outputs concatenate evenly)
    crop_h = height if not strip else nrows * th
    img = rgb_tiles.reshape(nrows, tiles_x, th, tw, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(nrows * th, tiles_x * tw, 3)
    img = img[:crop_h, :width]
    tmap = t_tiles.reshape(nrows, tiles_x, th, tw)
    tmap = tmap.transpose(0, 2, 1, 3).reshape(nrows * th, tiles_x * tw)
    tmap = tmap[:crop_h, :width]

    aux = dict(
        transmittance=tmap,
        tile_overflow=tile_overflow,
        capacity_overflow=binned.overflow,
        gauss_overflow=binned.gauss_overflow,
        num_instances=binned.num_instances,
    )
    return img, aux
