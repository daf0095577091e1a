"""Overlap-ready distributed backward: the ppermute ring all-reduce must
equal lax.psum, and sharded_train_step_overlap (in-body halo-exchange loss +
ring gradient reduction) must reproduce the monolithic sharded step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tpusplat.camera import look_at_camera
from tpusplat.config import RenderConfig
from tpusplat.io.synthetic import random_scene
from tpusplat.parallel.collectives import allreduce_bytes, ring_all_reduce
from tpusplat.parallel.mesh import make_render_mesh
from tpusplat.parallel.sharded import (
    params_sharding,
    sharded_train_step,
    sharded_train_step_overlap,
)
from tpusplat.train.step import create_train_state, make_optimizer
from tpusplat.types import stack_cameras


def test_ring_all_reduce_equals_psum():
    mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "tile"))
    x = jnp.arange(8 * 37, dtype=jnp.float32).reshape(8, 37) * 0.37 - 50.0
    tree = {"a": x, "b": jnp.linspace(-2, 3, 8 * 3 * 5).reshape(8, 3, 5)}

    def body(t):
        ring = ring_all_reduce(t, "data")
        ref = jax.tree_util.tree_map(lambda v: jax.lax.psum(v, "data"), t)
        return ring, ref

    spec = {"a": P("data", None), "b": P("data", None, None)}
    ring, ref = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(spec,), out_specs=(spec, spec),
        check_vma=False,
    ))(tree)
    for k in tree:
        np.testing.assert_allclose(
            np.asarray(ring[k]), np.asarray(ref[k]), rtol=1e-6, atol=1e-6)


def test_ring_all_reduce_axis_size_one():
    mesh = Mesh(np.array(jax.devices()).reshape(1, 8), ("one", "tile"))
    x = jnp.arange(24.0).reshape(8, 3)

    out = jax.jit(jax.shard_map(
        lambda t: ring_all_reduce(t, "one"), mesh=mesh,
        in_specs=(P("tile", None),), out_specs=P("tile", None),
        check_vma=False,
    ))(x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def _setup(n=512, w=96, h=64, batch=2):
    params = random_scene(n, seed=5, sh_degree=1, scale_range=(0.05, 0.3))
    cams = stack_cameras([
        look_at_camera([np.sin(i) * 2, 0.3, 6.0], [0, 0, 0], w, h, fov_deg=60.0)
        for i in range(batch)
    ])
    cfg = RenderConfig(sh_degree=1, max_per_tile=256, tile_chunk=4,
                       gauss_chunk=16, capacity_mult=16)
    rng = np.random.default_rng(0)
    targets = jnp.asarray(rng.uniform(0, 1, (batch, h, w, 3)), jnp.float32)
    return params, cams, targets, cfg


def _one_step(step_fn, params, cams, targets, cfg, mesh, **kw):
    optimizer = make_optimizer()
    state = create_train_state(params, optimizer)
    state = dataclasses.replace(
        state, params=jax.device_put(state.params, params_sharding(mesh)))
    state, metrics = step_fn(state, cams, targets, cfg, optimizer, mesh, **kw)
    return state, metrics


def test_overlap_step_matches_monolithic():
    params, cams, targets, cfg = _setup()
    mesh = make_render_mesh(data=2, tile=4)

    s_ref, m_ref = _one_step(sharded_train_step, params, cams, targets, cfg, mesh)
    for mode in ("ring", "psum"):
        s_ovl, m_ovl = _one_step(
            sharded_train_step_overlap, params, cams, targets, cfg, mesh,
            grad_reduce=mode)
        assert np.isclose(float(m_ovl["loss"]), float(m_ref["loss"]),
                          rtol=1e-5), mode
        assert int(np.asarray(m_ovl["capacity_overflow"]).sum()) == 0
        for f in ("means", "log_scales", "quats", "opacities", "sh"):
            np.testing.assert_allclose(
                np.asarray(getattr(s_ovl.params, f)),
                np.asarray(getattr(s_ref.params, f)),
                atol=3e-6, err_msg=f"{mode}:{f}",
            )
        assert int(s_ovl.step) == 1


def test_overlap_step_tile_only_mesh():
    params, cams, targets, cfg = _setup(batch=1)
    mesh = make_render_mesh(data=1, tile=8)
    s_ref, m_ref = _one_step(sharded_train_step, params, cams, targets, cfg, mesh)
    s_ovl, m_ovl = _one_step(
        sharded_train_step_overlap, params, cams, targets, cfg, mesh)
    assert np.isclose(float(m_ovl["loss"]), float(m_ref["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_ovl.params.means), np.asarray(s_ref.params.means),
        atol=3e-6)


def test_allreduce_bytes():
    acct = allreduce_bytes(59 * 1_000_000, 8)
    assert acct["grad_bytes"] == 59 * 4_000_000
    assert acct["steps"] == 14
    # Ring volume: 2 * 7/8 of the gradient bytes.
    assert abs(acct["ring_bytes_per_device"] - 2 * 7 / 8 * acct["grad_bytes"]) < 8
