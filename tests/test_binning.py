"""Unit tests for instance expansion, sorting, and tile ranges against a
brute-force numpy emulation of the reference's K3-K7 semantics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpusplat.camera import look_at_camera
from tpusplat.config import RenderConfig
from tpusplat.io.synthetic import random_scene
from tpusplat.ops.binning import bin_and_sort, searchsorted_left, searchsorted_right
from tpusplat.ops.preprocess import preprocess


def _reference_instances(pg, tiles_x, num_tiles):
    """Brute-force emission + stable (tile, depth, emission) sort in numpy."""
    ntiles = np.asarray(pg.ntiles)
    aabb = np.asarray(pg.aabb)
    depth = np.asarray(pg.depth)
    entries = []  # (tile, depth, gauss_id, emission_counter)
    for i in range(ntiles.shape[0]):
        if ntiles[i] == 0:
            continue
        x0, y0, x1, y1 = aabb[i]
        for tx in range(x0, x1):  # x outer, y inner (preprocess_sort.comp)
            for ty in range(y0, y1):
                entries.append((tx + ty * tiles_x, depth[i], i))
    entries.sort(key=lambda e: (e[0], e[1]))  # python stable sort
    return entries


def test_searchsorted_helpers():
    rng = np.random.default_rng(0)
    a = np.sort(rng.integers(0, 1000, 257)).astype(np.int32)
    v = rng.integers(-5, 1005, 513).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(searchsorted_right(jnp.asarray(a), jnp.asarray(v))),
        np.searchsorted(a, v, side="right"),
    )
    np.testing.assert_array_equal(
        np.asarray(searchsorted_left(jnp.asarray(a), jnp.asarray(v))),
        np.searchsorted(a, v, side="left"),
    )


def test_bin_and_sort_matches_bruteforce():
    params = random_scene(300, seed=9, sh_degree=0, scale_range=(0.05, 0.4))
    cam = look_at_camera([0, 0, 6.0], [0, 0, 0], 96, 80, fov_deg=60.0)
    cfg = RenderConfig(capacity_mult=32)
    pg = preprocess(params, cam, cfg)
    tiles_x, tiles_y = cfg.tile_grid(96, 80)
    binned = bin_and_sort(pg, 96, 80, cfg)

    ref = _reference_instances(pg, tiles_x, tiles_x * tiles_y)
    total = int(binned.num_instances)
    assert total == len(ref)
    assert int(binned.overflow) == 0

    got_tiles = np.asarray(binned.tile_id)[:total]
    got_gids = np.asarray(binned.gauss_id)[:total]
    np.testing.assert_array_equal(got_tiles, [e[0] for e in ref])
    # Within equal (tile, depth) the emission order must match exactly — the
    # stable-sort parity guarantee.
    np.testing.assert_array_equal(got_gids, [e[2] for e in ref])

    # Tile ranges consistent with the sorted stream.
    starts = np.asarray(binned.tile_start)
    ends = np.asarray(binned.tile_end)
    for t in range(tiles_x * tiles_y):
        seg = got_tiles[starts[t]:ends[t]]
        assert (seg == t).all()
    assert (ends - starts).sum() == total


def test_overflow_reported():
    params = random_scene(500, seed=1, sh_degree=0, scale_range=(0.2, 0.5))
    cam = look_at_camera([0, 0, 5.0], [0, 0, 0], 128, 128, fov_deg=60.0)
    cfg = RenderConfig(capacity=1024)  # deliberately tiny
    pg = preprocess(params, cam, cfg)
    binned = bin_and_sort(pg, 128, 128, cfg)
    assert int(binned.overflow) > 0
    assert int(binned.num_instances) == 1024


def test_row_window_partitions_instances():
    """Strip-mode emission over disjoint row windows covers exactly the
    full-image instance set."""
    params = random_scene(200, seed=3, sh_degree=0, scale_range=(0.05, 0.3))
    cam = look_at_camera([0, 0, 6.0], [0, 0, 0], 64, 64, fov_deg=60.0)
    cfg = RenderConfig(capacity_mult=32)
    pg = preprocess(params, cam, cfg)
    full = bin_and_sort(pg, 64, 64, cfg)
    tiles_x, tiles_y = cfg.tile_grid(64, 64)

    got = 0
    for r0 in range(0, tiles_y, 2):
        strip = bin_and_sort(pg, 64, 64, cfg, row0=r0, nrows=2)
        got += int(strip.num_instances)
    assert got == int(full.num_instances)


def test_searchsorted_left_big_matches():
    from tpusplat.ops.binning import _SUB, searchsorted_left_big

    rng = np.random.default_rng(5)
    n = 8 * _SUB
    a = np.sort(rng.integers(0, 500, n)).astype(np.int32)
    v = rng.integers(-3, 503, 700).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(jax.jit(searchsorted_left_big)(jnp.asarray(a), jnp.asarray(v))),
        np.searchsorted(a, v, side="left"),
    )
    # sentinel-heavy tail like the sorted tile array
    a2 = np.concatenate([np.sort(rng.integers(0, 100, n // 2)),
                         np.full(n // 2, 2**31 - 1)]).astype(np.int32)
    v2 = np.arange(0, 102).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(jax.jit(searchsorted_left_big)(jnp.asarray(a2), jnp.asarray(v2))),
        np.searchsorted(a2, v2, side="left"),
    )


def test_tall_frame_routes_to_xla_expand():
    """tiles_y > 255 exceeds the Pallas emission kernel's 8-bit packed
    meta bound (ADVICE r4) — bin_and_sort must fall back to the XLA
    expansion and still produce correct results. tile_h=2 keeps the test
    cheap while pushing tiles_y to 300."""
    params = random_scene(400, seed=11, sh_degree=0, scale_range=(0.02, 0.1))
    cam = look_at_camera([0.0, 0.5, 6.0], [0, 0, 0], 64, 600, fov_deg=60.0)
    cfg_p = RenderConfig(sh_degree=0, tile_w=16, tile_h=2, use_pallas=True,
                         capacity_mult=32)
    cfg_x = dataclasses.replace(cfg_p, use_pallas=False)
    tiles_x, tiles_y = cfg_p.tile_grid(64, 600)
    assert tiles_y > 255

    pg = preprocess(params, cam, cfg_p)
    a = jax.jit(lambda pg: bin_and_sort(pg, 64, 600, cfg_p))(pg)
    b = jax.jit(lambda pg: bin_and_sort(pg, 64, 600, cfg_x))(pg)
    assert int(a.num_instances) == int(b.num_instances) > 0
    np.testing.assert_array_equal(np.asarray(a.gauss_id), np.asarray(b.gauss_id))
    np.testing.assert_array_equal(np.asarray(a.tile_start), np.asarray(b.tile_start))
