"""Compact-gradient all-to-all exchange (parallel/compact_grad.py).

The compact path must be numerically equal to the dense psum-scatter
exchange: identical forward images (same kernels, same inputs) and
parameter updates equal up to fp reassociation of the gradient
reductions. Also covers the generalized segment-reduce kernel's two new
modes (streamed targets, multi-range-per-segment) against numpy, and the
bucket-overflow gate.

Scene fixture: a 256-px-tall frame (16 tile rows) split over 8 or 4 tile
shards (batch 1 / 2) with strip_gauss_mult = 1.5 -> gauss cap < N in BOTH
geometries, so strip compaction (and with it the compact exchange) is
ACTIVE everywhere — asserted per geometry, since a fixture where it
silently falls back to dense would test nothing (a 2.0 multiplier made
exactly that happen for the 4-shard case: cap == N -> None -> dense).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusplat.camera import look_at_camera
from tpusplat.config import RenderConfig
from tpusplat.io.synthetic import random_scene
from tpusplat.parallel.mesh import make_render_mesh
from tpusplat.parallel.sharded import (
    params_sharding,
    render_sharded,
    sharded_train_step,
    sharded_train_step_overlap,
)
from tpusplat.train.step import create_train_state, make_optimizer
from tpusplat.types import stack_cameras

N, W, H = 4096, 128, 256  # tiles_y = 16 -> 2 rows/shard on 8 tile shards


def _setup(batch=1, sort_by_y=False):
    params = random_scene(N, seed=3, sh_degree=1, scale_range=(0.05, 0.3))
    if sort_by_y:
        # id order correlated with screen row -> a strip's stream ids are
        # nearly contiguous -> maximal all-to-all bucket skew.
        order = jnp.argsort(params.means[:, 1])
        params = jax.tree_util.tree_map(
            lambda x: x[order] if hasattr(x, "shape") and x.shape
            and x.shape[0] == N else x, params)
    cams = stack_cameras([
        look_at_camera([np.sin(i) * 2, 0.3, 6.0], [0, 0, 0], W, H,
                       fov_deg=60.0)
        for i in range(batch)
    ])
    cfg = RenderConfig(sh_degree=1, use_pallas=True, capacity_mult=16,
                       strip_gauss_mult=1.5, max_per_tile=2048,
                       grad_exchange="compact", grad_a2a_mult=2.0)
    rng = np.random.default_rng(0)
    targets = jnp.asarray(rng.uniform(0, 1, (batch, H, W, 3)), jnp.float32)
    return params, cams, targets, cfg


def _mesh(batch=1):
    return make_render_mesh(data=batch, tile=8 // batch)


@pytest.mark.parametrize("tile_shards", [8, 4])
def test_fixture_compaction_active(tile_shards):
    _, _, _, cfg = _setup()
    tiles_y = cfg.tile_grid(W, H)[1]
    nrows = -(-tiles_y // tile_shards)
    gcap = cfg.strip_gauss_capacity(N, nrows, tiles_y)
    assert gcap is not None and gcap < N, (
        f"fixture must exercise strip compaction on {tile_shards} shards, "
        "else compact == dense trivially")


def test_forward_images_identical():
    params, cams, targets, cfg = _setup()
    mesh = _mesh()
    cfg_d = dataclasses.replace(cfg, grad_exchange="dense")
    img_c, cnt_c = jax.jit(render_sharded, static_argnames=("cfg", "mesh"))(
        params, cams, cfg, mesh)
    img_d, cnt_d = jax.jit(render_sharded, static_argnames=("cfg", "mesh"))(
        params, cams, cfg_d, mesh)
    assert int(np.asarray(cnt_c["a2a_overflow"]).sum()) == 0
    assert int(np.asarray(cnt_c["capacity_overflow"]).sum()) == 0
    # Same inputs through the same forward kernels — equal to within
    # interpret-mode fusion jitter (the two programs differ around the
    # kernels, so XLA:CPU may round intermediates differently by an ulp).
    np.testing.assert_allclose(np.asarray(img_c), np.asarray(img_d),
                               atol=1e-6, rtol=1e-5)


def _one_step(step_fn, params, cams, targets, cfg, mesh, **kw):
    optimizer = make_optimizer()
    state = create_train_state(params, optimizer)
    state = dataclasses.replace(
        state, params=jax.device_put(state.params, params_sharding(mesh)))
    return step_fn(state, cams, targets, cfg, optimizer, mesh, **kw)


@pytest.mark.parametrize("batch", [1, 2])
def test_train_step_compact_equals_dense(batch):
    params, cams, targets, cfg = _setup(batch=batch)
    mesh = _mesh(batch)
    cfg_d = dataclasses.replace(cfg, grad_exchange="dense")
    s_c, m_c = _one_step(sharded_train_step, params, cams, targets, cfg, mesh)
    s_d, m_d = _one_step(sharded_train_step, params, cams, targets, cfg_d,
                         mesh)
    assert int(np.asarray(m_c["a2a_overflow"]).sum()) == 0
    assert np.isclose(float(np.asarray(m_c["loss"]).mean()),
                      float(np.asarray(m_d["loss"]).mean()), rtol=1e-6)
    assert int(s_c.step) == 1
    for f in ("means", "log_scales", "quats", "opacities", "sh"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_c.params, f)),
            np.asarray(getattr(s_d.params, f)),
            atol=3e-6, err_msg=f,
        )


def test_overlap_step_compact_matches_dense_monolithic():
    params, cams, targets, cfg = _setup()
    mesh = _mesh()
    cfg_d = dataclasses.replace(cfg, grad_exchange="dense")
    s_ref, m_ref = _one_step(sharded_train_step, params, cams, targets,
                             cfg_d, mesh)
    s_c, m_c = _one_step(sharded_train_step_overlap, params, cams, targets,
                         cfg, mesh, grad_reduce="ring")
    assert np.isclose(float(np.asarray(m_c["loss"]).mean()),
                      float(np.asarray(m_ref["loss"]).mean()), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_c.params.means), np.asarray(s_ref.params.means),
        atol=3e-6)


def test_a2a_bucket_overflow_gates_step():
    """Adversarial id layout (ids sorted by screen y) concentrates one
    strip's stream into few buckets; with a tight grad_a2a_mult the
    forward-counted bucket overflow must gate the step to a no-op."""
    params, cams, targets, cfg = _setup(sort_by_y=True)
    cfg = dataclasses.replace(cfg, grad_a2a_mult=0.01)
    mesh = _mesh()
    state0_params = params
    s, m = _one_step(sharded_train_step, params, cams, targets, cfg, mesh)
    assert int(np.asarray(m["a2a_overflow"]).sum()) > 0, (
        "fixture failed to overflow a bucket")
    assert int(s.step) == 0
    np.testing.assert_array_equal(np.asarray(s.params.means),
                                  np.asarray(state0_params.means))
    # And with the default capacity the same adversarial layout fits,
    # still matching dense.
    cfg_ok = dataclasses.replace(cfg, grad_a2a_mult=2.0)
    cfg_d = dataclasses.replace(cfg_ok, grad_exchange="dense")
    s_c, m_c = _one_step(sharded_train_step, params, cams, targets, cfg_ok,
                         mesh)
    s_d, _ = _one_step(sharded_train_step, params, cams, targets, cfg_d,
                       mesh)
    # Worst-case skew may legitimately overflow even 2x; the contract is
    # only: zero overflow -> equality, nonzero -> gated no-op.
    if int(np.asarray(m_c["a2a_overflow"]).sum()) == 0:
        np.testing.assert_allclose(np.asarray(s_c.params.means),
                                   np.asarray(s_d.params.means), atol=3e-6)
    else:
        assert int(s_c.step) == 0


def test_segment_reduce_streamed_targets_vs_numpy():
    from tpusplat.ops import rasterize_pallas as rp
    from tpusplat.ops.binning import searchsorted_left

    rng = np.random.default_rng(1)
    n, c = 5000, 4096
    gid = np.sort(rng.integers(0, n, c)).astype(np.int32)
    grad = rng.normal(size=(rp.GPAD, c)).astype(np.float32)
    n_pad = rp.GB * rp.SEGG  # one program, 2048 targets
    # targets: an arbitrary ascending-per-range subset + sentinel padding
    tvals = np.unique(rng.integers(0, n, n_pad // 2)).astype(np.int32)
    targets = np.full(n_pad, n, np.int32)
    targets[: len(tvals)] = tvals

    tseg = targets.reshape(-1, rp.GB)
    tmin = jnp.asarray(tseg.min(axis=1))
    tmax = jnp.asarray(np.where(tseg < n, tseg, -1).max(axis=1))
    gid_j = jnp.asarray(gid)
    lo = searchsorted_left(gid_j, tmin)
    hi = searchsorted_left(gid_j, tmax + 1)
    win = 256
    gradp = jnp.pad(jnp.asarray(grad), ((0, 0), (0, win)))
    gidp = jnp.pad(gid_j[None, :], ((0, 0), (0, win)), constant_values=-1)
    out = jax.jit(lambda g, i, lo, hi, t: rp._run_segment_reduce_general(
        g, i, lo, hi, n_pad, n, win, rps=1, targets=t))(
        gradp, gidp, lo, hi, jnp.asarray(targets)[None, :])
    out = np.asarray(out)

    ref = np.zeros((rp.GPAD, n_pad), np.float32)
    for j, t in enumerate(targets):
        if t < n:
            ref[:, j] = grad[:, gid == t].sum(axis=1)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_segment_reduce_multirange_vs_numpy():
    from tpusplat.ops import rasterize_pallas as rp
    from tpusplat.ops.binning import searchsorted_left

    rng = np.random.default_rng(2)
    n_local, s, cap, win = 2048, 4, 1024, 128
    capw = cap + win
    # S blocks, each id-sorted with sentinels (n_local) at the end
    blocks_id, blocks_g = [], []
    for b in range(s):
        k = int(rng.integers(cap // 2, cap))
        ids = np.sort(rng.integers(0, n_local, k)).astype(np.int32)
        ids = np.concatenate([ids, np.full(cap - k, n_local, np.int32)])
        blocks_id.append(ids)
        blocks_g.append(rng.normal(size=(rp.GPAD, cap)).astype(np.float32))
    lid = np.stack(blocks_id)  # [S, cap]
    g = np.stack(blocks_g, axis=1)  # [GPAD, S, cap]
    g_flat = np.pad(g, ((0, 0), (0, 0), (0, win))).reshape(rp.GPAD, s * capw)
    lid_flat = np.pad(lid, ((0, 0), (0, win)),
                      constant_values=n_local).reshape(1, s * capw)

    n_pad2 = rp.GB * rp.SEGG
    nseg = n_pad2 // rp.GB
    qs = jnp.minimum(jnp.arange(nseg + 1, dtype=jnp.int32) * rp.GB, n_local)
    bounds = jax.vmap(lambda a: searchsorted_left(a, qs))(jnp.asarray(lid))
    base = (jnp.arange(s, dtype=jnp.int32) * capw)[:, None]
    lo = (bounds[:, :-1] + base).transpose(1, 0).reshape(-1)
    hi = (bounds[:, 1:] + base).transpose(1, 0).reshape(-1)
    out = jax.jit(lambda g, i, lo, hi: rp._run_segment_reduce_general(
        g, i, lo, hi, n_pad2, n_local, win, rps=s))(
        jnp.asarray(g_flat), jnp.asarray(lid_flat), lo, hi)
    out = np.asarray(out)

    ref = np.zeros((rp.GPAD, n_pad2), np.float32)
    for b in range(s):
        for j in range(cap):
            t = lid[b, j]
            if t < n_local:
                ref[:, t] += g[:, b, j]
    np.testing.assert_allclose(out, ref, atol=1e-4)
