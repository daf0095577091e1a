"""The Pallas emission kernel must agree exactly with the XLA
expand_instances formulation — same (tile, gid) per slot, same totals —
across scene sizes, strip windows (traced row0), and overflow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusplat.camera import look_at_camera
from tpusplat.config import RenderConfig
from tpusplat.io.synthetic import random_scene
from tpusplat.ops.binning import expand_instances
from tpusplat.ops.emission import expand_instances_pallas
from tpusplat.ops.preprocess import preprocess


def _pg_and_order(n, seed, w=256, h=192, srange=(0.01, 0.08)):
    params = random_scene(n, seed=seed, sh_degree=0, scale_range=srange,
                          extent=4.0)
    cam = look_at_camera([0.0, 0.5, 7.0], [0.0, 0.0, 0.0], w, h, fov_deg=60.0)
    cfg = RenderConfig(sh_degree=0)
    pg = preprocess(params, cam, cfg)
    key = jnp.where(pg.ntiles > 0, pg.depth, jnp.float32(jnp.inf))
    order = jnp.argsort(key, stable=True)
    tiles_x, tiles_y = cfg.tile_grid(w, h)
    return pg, order, tiles_x, tiles_y


@pytest.mark.parametrize("n,capmult", [(500, 8), (5000, 6), (20000, 4)])
def test_emission_matches_xla_expand(n, capmult):
    pg, order, tiles_x, tiles_y = _pg_and_order(n, seed=n)
    capacity = max(1024, -(-capmult * n // 1024) * 1024)

    fn_x = jax.jit(lambda pg, o: expand_instances(
        pg, tiles_x, capacity, 0, tiles_y, o))
    fn_p = jax.jit(lambda pg, o: expand_instances_pallas(
        pg, tiles_x, capacity, 0, tiles_y, o))
    tile_x, gid_x, tot_x, ovf_x, govf_x = fn_x(pg, order)
    tile_p, gid_p, tot_p, ovf_p, govf_p = fn_p(pg, order)

    assert int(tot_x) == int(tot_p)
    assert int(ovf_x) == int(ovf_p)
    assert int(govf_x) == int(govf_p) == 0
    np.testing.assert_array_equal(np.asarray(tile_x), np.asarray(tile_p))
    np.testing.assert_array_equal(np.asarray(gid_x), np.asarray(gid_p))


def test_emission_strip_window_traced_row0():
    pg, order, tiles_x, tiles_y = _pg_and_order(4000, seed=7)
    capacity = 16 * 1024
    nrows = max(1, tiles_y // 3)
    for row0 in (0, nrows, 2 * nrows):
        r0 = jnp.asarray(row0, jnp.int32)  # traced, like axis_index
        fn_x = jax.jit(lambda pg, o, r: expand_instances(
            pg, tiles_x, capacity, r, nrows, o))
        fn_p = jax.jit(lambda pg, o, r: expand_instances_pallas(
            pg, tiles_x, capacity, r, nrows, o))
        tile_x, gid_x, tot_x, _, _ = fn_x(pg, order, r0)
        tile_p, gid_p, tot_p, _, _ = fn_p(pg, order, r0)
        assert int(tot_x) == int(tot_p)
        np.testing.assert_array_equal(np.asarray(tile_x), np.asarray(tile_p))
        np.testing.assert_array_equal(np.asarray(gid_x), np.asarray(gid_p))


def test_emission_overflow_truncation():
    pg, order, tiles_x, tiles_y = _pg_and_order(8000, seed=3)
    total = int(jnp.sum(pg.ntiles))
    capacity = max(1024, (total // 3) // 1024 * 1024)  # force overflow
    assert total > capacity
    tile_x, gid_x, tot_x, ovf_x, _ = jax.jit(lambda: expand_instances(
        pg, tiles_x, capacity, 0, tiles_y, order))()
    tile_p, gid_p, tot_p, ovf_p, _ = jax.jit(lambda: expand_instances_pallas(
        pg, tiles_x, capacity, 0, tiles_y, order))()
    assert int(ovf_x) == int(ovf_p) == total - capacity
    assert int(tot_x) == int(tot_p) == capacity
    np.testing.assert_array_equal(np.asarray(tile_x), np.asarray(tile_p))
    np.testing.assert_array_equal(np.asarray(gid_x), np.asarray(gid_p))


def test_emission_all_culled():
    pg, order, tiles_x, tiles_y = _pg_and_order(512, seed=1)
    import dataclasses

    pg0 = dataclasses.replace(pg, ntiles=jnp.zeros_like(pg.ntiles))
    key = jnp.where(pg0.ntiles > 0, pg0.depth, jnp.float32(jnp.inf))
    order0 = jnp.argsort(key, stable=True)
    tile_p, gid_p, tot_p, ovf_p, _ = jax.jit(lambda: expand_instances_pallas(
        pg0, tiles_x, 2048, 0, tiles_y, order0))()
    assert int(tot_p) == 0 and int(ovf_p) == 0
    assert np.all(np.asarray(tile_p) == 2**31 - 1)
    assert np.all(np.asarray(gid_p) == 512)


def test_emission_gauss_capacity_compaction():
    """Strip compaction: with a sufficient cap and a strip-clipped depth
    key, outputs are identical to the uncompacted strip expansion."""
    pg, _, tiles_x, tiles_y = _pg_and_order(6000, seed=9)
    capacity = 32 * 1024
    nrows = max(1, tiles_y // 3)
    row0 = nrows

    y0c = jnp.clip(pg.aabb[:, 1], row0, row0 + nrows)
    y1c = jnp.clip(pg.aabb[:, 3], row0, row0 + nrows)
    vis = (pg.ntiles > 0) & (y1c > y0c)
    key = jnp.where(vis, pg.depth, jnp.float32(jnp.inf))
    order = jnp.argsort(key, stable=True)
    n_vis = int(jnp.sum(vis))
    gcap = max(1024, -(-n_vis // 1024) * 1024)

    ref = jax.jit(lambda: expand_instances(
        pg, tiles_x, capacity, row0, nrows, order))()
    got = jax.jit(lambda: expand_instances_pallas(
        pg, tiles_x, capacity, row0, nrows, order, gauss_capacity=gcap))()
    assert int(ref[2]) == int(got[2])
    assert int(got[3]) == 0
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))

    # Too-small cap: dropped instances surface in the SEPARATE gauss
    # channel (the recovery is strip_gauss_mult, not instance capacity).
    small = max(1024, (n_vis // 2) // 1024 * 1024)
    if small < n_vis:
        _, _, tot_s, ovf_s, govf_s = jax.jit(lambda: expand_instances_pallas(
            pg, tiles_x, capacity, row0, nrows, order,
            gauss_capacity=small))()
        assert int(govf_s) > 0
        assert int(tot_s) + int(ovf_s) + int(govf_s) \
            == int(ref[2]) + int(ref[3])


def test_bin_and_sort_strip_compaction_matches():
    """bin_and_sort with cfg-driven strip compaction equals the
    uncompacted result (the full multi-chip configuration)."""
    import dataclasses

    from tpusplat.config import RenderConfig
    from tpusplat.ops.binning import bin_and_sort

    pg, _, tiles_x, tiles_y = _pg_and_order(6000, seed=13)
    w, h = 256, 192
    cfg_on = RenderConfig(sh_degree=0, use_pallas=True, capacity_mult=8,
                          strip_gauss_mult=2.0)
    cfg_off = dataclasses.replace(cfg_on, strip_gauss_mult=0.0)
    nrows = max(1, tiles_y // 3)
    gcap = cfg_on.strip_gauss_capacity(6000, nrows, tiles_y)
    for row0 in (0, nrows):
        r0 = jnp.asarray(row0, jnp.int32)
        a = jax.jit(lambda r: bin_and_sort(pg, w, h, cfg_on, r, nrows,
                                           gauss_capacity=gcap))(r0)
        b = jax.jit(lambda r: bin_and_sort(pg, w, h, cfg_off, r, nrows))(r0)
        assert int(a.overflow) == 0
        np.testing.assert_array_equal(np.asarray(a.gauss_id),
                                      np.asarray(b.gauss_id))
        np.testing.assert_array_equal(np.asarray(a.tile_start),
                                      np.asarray(b.tile_start))
        np.testing.assert_array_equal(np.asarray(a.tile_end),
                                      np.asarray(b.tile_end))
