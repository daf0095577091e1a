"""Tile binning: instance expansion, depth sort, and tile ranges.

TPU-native replacement for four reference kernels:

  * K3 naive Hillis-Steele prefix sum (``prefix_sum.comp:32-52``, dispatched
    ceil(log2 N)+1 times) -> one ``jnp.cumsum``.
  * K4 scattered key emission (``preprocess_sort.comp:43-58``) -> a *gather*
    formulation: instead of each Gaussian scattering into its offset range
    (TPU has no scattered writes), each instance slot looks up its owning
    Gaussian with a vectorized binary search over the cumulative counts.
  * K5/K6 8-pass 64-bit radix sort (``sort/hist.comp``, ``sort/sort.comp``)
    -> a stable single-key ``lax.sort`` by tile id over instances emitted in
    depth-major order (depth pre-sort over Gaussians). The composition of a
    stable depth argsort and a stable tile sort reproduces the reference's
    (tile | depth-bits) 64-bit key order exactly, including its float-bits
    trick (``preprocess_sort.comp:53-55``), with 32-bit keys.
  * K7 tile-boundary extraction (``tile_boundary.comp:22-50``) -> one
    binary search per tile edge over the sorted tile ids (end[t] ==
    start[t+1]).

Everything is static-shape: the instance buffer has a fixed capacity C (the
analogue of ``sortBufferSizeMultiplier * N``, ``src/Renderer.h:143``), with
invalid slots pushed past all valid tiles by a sentinel key. Overflow is
*reported* as a count (device scalar) instead of triggering the reference's
mid-frame realloc + re-record (``src/Renderer.cpp:541-563``); callers re-jit
with a larger multiplier — same recovery, no per-frame host sync.

Instance emission order parity: the reference walks x in the outer loop and
y in the inner loop (``preprocess_sort.comp:47-48``), so rank r within a
Gaussian maps to (x = x0 + r // bbh, y = y0 + r % bbh).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from tpusplat.config import RenderConfig
from tpusplat.ops.preprocess import ProcessedGaussians


def searchsorted_right(a: jax.Array, v: jax.Array) -> jax.Array:
    """Vectorized binary search: #{i : a[i] <= v} for sorted ``a``.

    Drop-in for ``jnp.searchsorted(a, v, side="right")``, which as of JAX
    0.9 takes minutes to compile for large operands on TPU; this is a plain
    ceil(log2 N)-step fori_loop of gathers (compiles in seconds, same
    runtime).
    """
    n = a.shape[0]
    iters = max(1, n.bit_length())
    lo = jnp.zeros(v.shape, jnp.int32)
    hi = jnp.full(v.shape, n, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        active = lo < hi
        mid = (lo + hi) // 2
        go_right = active & (a[jnp.minimum(mid, n - 1)] <= v)
        return (
            jnp.where(go_right, mid + 1, lo),
            jnp.where(active & ~go_right, mid, hi),
        )

    lo, hi = lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def searchsorted_left(a: jax.Array, v: jax.Array) -> jax.Array:
    """#{i : a[i] < v} for sorted ``a`` (side='left' analogue)."""
    n = a.shape[0]
    iters = max(1, n.bit_length())
    lo = jnp.zeros(v.shape, jnp.int32)
    hi = jnp.full(v.shape, n, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        active = lo < hi
        mid = (lo + hi) // 2
        go_right = active & (a[jnp.minimum(mid, n - 1)] < v)
        return (
            jnp.where(go_right, mid + 1, lo),
            jnp.where(active & ~go_right, mid, hi),
        )

    lo, hi = lax.fori_loop(0, iters, body, (lo, hi))
    return lo


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BinnedInstances:
    """Depth-sorted (tile, gaussian) instances plus per-tile ranges.

    The backward pass re-sorts per-instance gradient rows by ``gauss_id``
    (measured cheaper on TPU than any gather/scatter permutation — see
    docs/PROFILE.md) so no emission-order bookkeeping is carried."""

    gauss_id: jax.Array  # [C] int32 sorted payload (sentinel = N)
    tile_id: jax.Array  # [C] int32 sorted tile index (sentinel = INT32_MAX)
    tile_start: jax.Array  # [T] int32
    tile_end: jax.Array  # [T] int32
    num_instances: jax.Array  # scalar int32 (valid, pre-clamp)
    overflow: jax.Array  # scalar int32: instances dropped due to capacity
    # Instances dropped because the strip's compacted Gaussian stream
    # overflowed cfg.strip_gauss_capacity — a separate channel because the
    # recovery differs: grow strip_gauss_mult, NOT the instance capacity.
    gauss_overflow: jax.Array  # scalar int32
    # Strip-compaction stream (compact mode only, else None): the global
    # gaussian ids of the strip's depth-ordered compacted stream
    # ([gauss_capacity] int32; entries past the visible count are the
    # sentinel N). The compact-gradient exchange keys its all-to-all
    # bucketing on this (parallel/compact_grad.py).
    stream_ids: jax.Array | None = None


def expand_instances(
    pg: ProcessedGaussians, tiles_x: int, capacity: int, row0=0, nrows=None,
    depth_order: jax.Array | None = None,
):
    """Produce per-slot (tile_id, gauss_id) for C static slots.

    Slot s belongs to the Gaussian g with off[g] <= s < off[g] + ntiles[g]
    (off = exclusive cumsum). Invalid slots get tile_id == INT32_MAX-ish
    sentinel so the sort pushes them to the end.

    ``depth_order`` (a permutation of [N]) emits Gaussians in that order —
    with a stable depth argsort this makes every slot sequence depth-major,
    so downstream only needs a single-key stable sort by tile.

    ``row0``/``nrows`` restrict emission to a window of tile rows
    [row0, row0 + nrows) with *local* tile ids — the unit of tile-sharding:
    each mesh shard expands only the instances that land in its strip.
    ``row0`` may be a traced value (e.g. ``axis_index``); ``nrows`` is static.
    """
    n = pg.ntiles.shape[0]
    x0, y0 = pg.aabb[:, 0], pg.aabb[:, 1]
    x1, y1 = pg.aabb[:, 2], pg.aabb[:, 3]
    if nrows is not None:
        y0 = jnp.clip(y0, row0, row0 + nrows)
        y1 = jnp.clip(y1, row0, row0 + nrows)
    ntiles = jnp.where(pg.ntiles > 0, (x1 - x0) * jnp.maximum(y1 - y0, 0), 0)

    # Per-Gaussian fields packed so BOTH permutations below are single row
    # gathers: separate 1-D gathers cost ~12 ms each at N=1.4M while one
    # [N, 5] row gather costs a fraction of that (docs/PROFILE.md).
    bbh = jnp.maximum(y1 - y0, 1)
    inv_bbh = 1.0 / bbh.astype(jnp.float32)  # exact for the small ints here
    tbl_id = jnp.stack(
        [ntiles, x0, y0, bbh, lax.bitcast_convert_type(inv_bbh, jnp.int32)],
        axis=-1,
    )  # [N, 5] in id order
    if depth_order is not None:
        ids = depth_order.astype(jnp.int32)
        tbl = tbl_id[depth_order]  # emission (depth) order
    else:
        ids = lax.iota(jnp.int32, n)
        tbl = tbl_id
    ntiles = tbl[:, 0]
    cum = jnp.cumsum(ntiles)  # inclusive
    off = cum - ntiles  # exclusive
    total = cum[-1]
    table = jnp.concatenate([off[:, None], tbl[:, 1:], ids[:, None]], axis=-1)
    # [N, 6] columns: off, x0, y0, bbh, inv_bbh bits, gaussian id

    # Owner lookup g[s] = #{i : cum[i] <= s}. The off values of non-empty
    # Gaussians are strictly increasing, so a unique-index scatter-max of
    # (i+1) at off[i] followed by a cumulative max yields the owner in O(C)
    # — no binary search (log2 N gather rounds) needed.
    slots = lax.iota(jnp.int32, capacity)
    marks = jnp.zeros((capacity,), jnp.int32).at[
        jnp.where(ntiles > 0, off, capacity)
    ].max(lax.iota(jnp.int32, n) + 1, mode="drop", unique_indices=True)
    g = lax.cummax(marks) - 1  # emission-order owner; -1 before first
    valid = (slots < jnp.minimum(total, capacity)) & (g >= 0)
    g_safe = jnp.clip(g, 0, n - 1)

    rows = table[g_safe]  # [C, 6]
    r = slots - rows[:, 0]
    # Integer div via float reciprocal (TPU has no hardware int div). The
    # +0.5 bias keeps the true quotient at least 0.5/bbh > 2^-8 away from an
    # integer, far beyond f32 rounding error for r < 2^13 — so floor is
    # exactly floor(r / bbh).
    q = jnp.floor(
        (r.astype(jnp.float32) + 0.5)
        * lax.bitcast_convert_type(rows[:, 4], jnp.float32)
    ).astype(jnp.int32)
    rem = r - q * rows[:, 3]
    tile = rows[:, 1] + q + (rows[:, 2] + rem - row0) * tiles_x

    sentinel = jnp.int32(2**31 - 1)
    tile = jnp.where(valid, tile, sentinel)
    gid = jnp.where(valid, rows[:, 5], n)
    overflow = jnp.maximum(total - capacity, 0)
    return (tile, gid.astype(jnp.int32), jnp.minimum(total, capacity),
            overflow, jnp.zeros((), total.dtype))


_SUB = 512  # subsample stride for the two-level boundary search


def searchsorted_left_big(a: jax.Array, v: jax.Array) -> jax.Array:
    """side='left' search over a LARGE sorted array via two levels.

    Level 1 binary-searches the ``a[::_SUB]`` subsample (log2(n/_SUB)
    rounds instead of log2(n) — searchsorted cost on TPU is per-round
    dispatch, not elements); level 2 resolves the exact position with one
    vectorized compare-and-count over each query's _SUB-wide block. Exact
    for integer-valued sorted ``a``/queries (uses the a <= v-1 identity)
    with len(a) a multiple of _SUB.
    """
    n = a.shape[0]
    assert n % _SUB == 0, "pad the search array to a _SUB multiple"
    blocks = a.reshape(n // _SUB, _SUB)
    sub = blocks[:, 0]
    # Block of the answer: last block whose first element is < v.
    b = jnp.maximum(searchsorted_right(sub, v - 1), 1) - 1
    win = blocks[b]  # [Q, _SUB] row gather
    cnt = jnp.sum(win < v[:, None], axis=-1).astype(jnp.int32)
    return b * _SUB + cnt


def pallas_emission_ok(cfg: RenderConfig, n: int, capacity: int,
                       tiles_x: int, tiles_y: int) -> bool:
    """Whether the Pallas emission kernel's exactness bounds hold: integer
    fields < 2^24, and BOTH tile-grid axes <= 255 (x0/y0/bbh are 8-bit
    fields of the packed meta word; y0/bbh are bounded by tiles_y, so a
    > 4080-px-tall frame would silently corrupt tile ids — the XLA
    formulation is used there). Also the prerequisite for strip compaction
    and the compact-gradient exchange (parallel/compact_grad.py)."""
    return (cfg.use_pallas and n < 2**24 and capacity < 2**24
            and tiles_x <= 255 and tiles_y <= 255)


def bin_and_sort(
    pg: ProcessedGaussians,
    width: int,
    height: int,
    cfg: RenderConfig,
    row0=0,
    nrows: int | None = None,
    capacity: int | None = None,
    gauss_capacity: int | None = None,
) -> BinnedInstances:
    """Bin instances for the full image or a window of ``nrows`` tile rows.

    ``gauss_capacity`` (strip mode only): compact the Gaussian stream to
    the first ``gauss_capacity`` depth-ordered STRIP-VISIBLE Gaussians
    before emission — the depth key then uses strip-clipped visibility, so
    the argsort itself performs the compaction (its first entries are
    exactly the strip's Gaussians in global depth order; relative order
    among them is unchanged, so tile-level parity is preserved). Gaussians
    beyond the cap are counted into ``overflow``.
    """
    tiles_x, tiles_y = cfg.tile_grid(width, height)
    if nrows is None:
        nrows = tiles_y
    num_tiles = tiles_x * nrows
    if capacity is None:
        capacity = cfg.instance_capacity(pg.ntiles.shape[0])

    n = pg.ntiles.shape[0]
    use_pallas_exp = pallas_emission_ok(cfg, n, capacity, tiles_x, tiles_y)
    compact = (use_pallas_exp and gauss_capacity is not None
               and gauss_capacity < n and nrows < tiles_y)

    # Depth pre-sort over Gaussians (N, stable) so instance emission is
    # depth-major and the big C-sort needs only the tile key. Parity: the
    # reference's stable radix sort orders by (tile, depth) with ties broken
    # by emission (gaussian-index) order — a stable argsort by depth followed
    # by a stable tile sort produces the identical permutation. Ordering
    # must not differentiate (the reference's sort is forward-only).
    y0c, y1c = pg.aabb[:, 1], pg.aabb[:, 3]
    if nrows < tiles_y:
        y0c = jnp.clip(y0c, row0, row0 + nrows)
        y1c = jnp.clip(y1c, row0, row0 + nrows)
    if compact:
        # Strip-clipped visibility key: invisible-IN-STRIP Gaussians sort
        # to the end, so order[:gauss_capacity] is the compacted stream.
        vis = (pg.ntiles > 0) & (y1c > y0c)
    else:
        vis = pg.ntiles > 0
    depth_key = lax.stop_gradient(
        jnp.where(vis, pg.depth, jnp.float32(jnp.inf))
    )

    stream_ids = None
    if use_pallas_exp:
        # Streaming Pallas emission (ops/emission.py): identical outputs,
        # ~5x faster than the XLA scatter/cummax/gather formulation below.
        # The per-Gaussian emission meta (clipped tile count + the packed
        # x0|y0|bbh word) rides through the depth sort as integer payloads:
        # measured 2.7 ms/strip cheaper than argsort followed by a
        # [stream, 2] row gather at XLA's ~6.7 ns/row (docs/MICRO_r05.md).
        from tpusplat.ops.emission import expand_instances_pallas

        x0 = pg.aabb[:, 0]
        ntiles_m = jnp.where(
            pg.ntiles > 0,
            (pg.aabb[:, 2] - x0) * jnp.maximum(y1c - y0c, 0), 0)
        bbh = jnp.maximum(y1c - y0c, 1)
        packed = x0 + (y0c << 8) + (bbh << 16)  # 8/8/8 bits, < 2^24
        _, ids_d, nt_d, pk_d = lax.sort(
            (depth_key, lax.iota(jnp.int32, n), ntiles_m, packed),
            num_keys=1, is_stable=True)
        total_true = jnp.sum(ntiles_m)
        if compact:
            n_vis = jnp.sum(vis.astype(jnp.int32))
            ids_d = ids_d[:gauss_capacity]
            nt_d = nt_d[:gauss_capacity]
            pk_d = pk_d[:gauss_capacity]
            # Entries past the visible count are arbitrary invisible ids —
            # masked to the sentinel N so downstream consumers (the
            # compact-gradient exchange) can skip them.
            stream_ids = jnp.where(
                lax.iota(jnp.int32, gauss_capacity) < n_vis,
                ids_d, jnp.int32(n))

        tile, gid, total, overflow, gauss_ovf = expand_instances_pallas(
            pg, tiles_x, capacity, row0, nrows,
            meta_sorted=(ids_d, nt_d, pk_d, total_true),
        )
    else:
        depth_order = jnp.argsort(depth_key, stable=True)
        tile, gid, total, overflow, gauss_ovf = expand_instances(
            pg, tiles_x, capacity, row0, nrows, depth_order
        )
    tile_s, gid_s = lax.sort((tile, gid), num_keys=1, is_stable=True)

    # Tile ranges from the sorted tile ids (K7 analogue): T+1 binary searches
    # over the sorted ids; end[t] == start[t+1], so one search array serves
    # both (empty tiles get start == end, the reference's convention at
    # ``tile_boundary.comp:22-50``). Two-level search: capacity is always a
    # _SUB multiple (instance_capacity rounds to 1024).
    tile_range = lax.iota(jnp.int32, num_tiles + 1)
    if capacity % _SUB == 0:
        bounds = searchsorted_left_big(tile_s, tile_range)
    else:
        bounds = searchsorted_left(tile_s, tile_range)

    return BinnedInstances(
        gauss_id=gid_s,
        tile_id=tile_s,
        tile_start=bounds[:num_tiles],
        tile_end=bounds[1:],
        num_instances=total.astype(jnp.int32),
        overflow=overflow.astype(jnp.int32),
        gauss_overflow=gauss_ovf.astype(jnp.int32),
        stream_ids=stream_ids,
    )
