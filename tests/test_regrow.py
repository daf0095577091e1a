"""Automatic capacity recovery and the opacity-aware tight radius.

Parity contracts:
  * render_auto on an engineered-to-overflow config must converge to the
    same image as a run with ample capacity (the reference's sort-buffer
    growth + retry, ``src/Renderer.cpp:541-563``).
  * tight_radius=True must change neither the image nor any gradient — it
    only shrinks tile AABBs to the region where alpha >= 1/255 is possible
    (``render.comp:77-79`` cutoff).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpusplat.camera import look_at_camera
from tpusplat.config import RenderConfig
from tpusplat.io.synthetic import random_scene
from tpusplat.render import render_auto, render_stages
from tpusplat.train.step import merge_trainable, split_trainable


def _setup(n=300, w=64, h=48, seed=3):
    params = random_scene(n, seed=seed, sh_degree=1, scale_range=(0.05, 0.3))
    cam = look_at_camera([0.2, 0.1, 6.0], [0, 0, 0], w, h, fov_deg=60.0)
    return params, cam


def test_render_auto_regrows_to_exact_image():
    params, cam = _setup(n=600)
    params = dataclasses.replace(params, log_scales=params.log_scales + 0.7)
    big = RenderConfig(sh_degree=1, capacity_mult=64, max_per_tile=2048,
                       tile_chunk=4, gauss_chunk=16)
    ref, aux_big = render_stages(params, cam, big)
    assert int(aux_big["capacity_overflow"]) == 0
    assert int(aux_big["num_instances"]) > 1024  # else tiny cannot overflow

    tiny = dataclasses.replace(big, capacity=1024, capacity_mult=1)
    _, aux_tiny = render_stages(params, cam, tiny)
    assert int(aux_tiny["capacity_overflow"]) > 0  # engineered overflow

    img, aux, grown = render_auto(params, cam, tiny)
    assert int(aux["capacity_overflow"]) == 0
    assert grown.capacity > 1024
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-5)


def test_render_auto_no_regrow_when_fits():
    params, cam = _setup(n=50)
    cfg = RenderConfig(sh_degree=1, capacity_mult=64, tile_chunk=4,
                       gauss_chunk=16)
    _, aux, same = render_auto(params, cam, cfg)
    assert same is cfg  # config untouched when capacity suffices
    assert int(aux["capacity_overflow"]) == 0


def test_tight_radius_image_and_grads_identical():
    params, cam = _setup(n=250, seed=9)
    # Mix in very low opacities so the tight radius actually bites.
    params = dataclasses.replace(
        params, opacities=params.opacities - 2.0)
    loose = RenderConfig(sh_degree=1, capacity_mult=128, max_per_tile=2048,
                         tile_chunk=4, gauss_chunk=16, tight_radius=False)
    tight = dataclasses.replace(loose, tight_radius=True)

    img_l, aux_l = render_stages(params, cam, loose)
    img_t, aux_t = render_stages(params, cam, tight)
    # Equality only holds when neither run truncates.
    assert int(aux_l["capacity_overflow"]) == 0
    assert int(aux_l["tile_overflow"]) == 0
    # Strictly fewer instances; pixels identical up to float reassociation
    # (shorter per-tile lists change the chunked-sum association, ~1 ulp).
    assert int(aux_t["num_instances"]) < int(aux_l["num_instances"])
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_l), atol=5e-7)

    trainable, alive = split_trainable(params)
    target = jnp.ones_like(img_l) * 0.25

    def loss(tr, cfg):
        img, _ = render_stages(merge_trainable(tr, alive), cam, cfg)
        return jnp.mean((img - target) ** 2)

    g_l = jax.grad(loss)(trainable, loose)
    g_t = jax.grad(loss)(trainable, tight)
    for f in ("means", "log_scales", "quats", "opacities", "sh"):
        np.testing.assert_allclose(
            np.asarray(g_t[f]), np.asarray(g_l[f]), atol=1e-6, rtol=1e-4,
            err_msg=f)


def test_tight_radius_culls_sub_cutoff_opacity():
    """opacity <= 1/255 can never pass the blend cutoff -> fully culled."""
    from tpusplat.ops.preprocess import preprocess

    params, cam = _setup(n=20)
    params = dataclasses.replace(
        params, opacities=jnp.full_like(params.opacities, -8.0))  # sigmoid ~ 3e-4
    cfg = RenderConfig(sh_degree=1, tight_radius=True)
    pg = preprocess(params, cam, cfg)
    assert int(jnp.sum(pg.ntiles)) == 0


def test_train_step_overflow_is_noop():
    """An overflowed training step must not apply a truncated gradient:
    params, opt state, and the step counter stay exactly unchanged
    (in-graph gate; the host regrows + retries, matching the reference's
    frame retry at src/Renderer.cpp:541-563)."""
    from tpusplat.train.step import create_train_state, make_optimizer, train_step

    params, cam = _setup(n=600)
    params = dataclasses.replace(params, log_scales=params.log_scales + 0.7)
    target = jnp.zeros((cam.height, cam.width, 3), jnp.float32)
    optimizer = make_optimizer()

    tiny = RenderConfig(sh_degree=1, capacity=1024, max_per_tile=2048,
                        tile_chunk=4, gauss_chunk=16)
    state0 = create_train_state(params, optimizer)
    state1, metrics = train_step(state0, cam, target, tiny, optimizer)
    assert int(metrics["capacity_overflow"]) > 0  # engineered overflow
    assert int(state1.step) == 0
    for f in ("means", "log_scales", "quats", "opacities", "sh"):
        np.testing.assert_array_equal(
            np.asarray(getattr(state1.params, f)),
            np.asarray(getattr(state0.params, f)), err_msg=f)
    np.testing.assert_array_equal(
        np.asarray(state1.grad_accum), np.asarray(state0.grad_accum))

    # Retry at grown capacity applies a real step.
    grown = dataclasses.replace(tiny, capacity=64 * 1024)
    state2, metrics2 = train_step(state1, cam, target, grown, optimizer)
    assert int(metrics2["capacity_overflow"]) == 0
    assert int(state2.step) == 1
    assert not np.array_equal(
        np.asarray(state2.params.means), np.asarray(state0.params.means))


def test_sharded_train_step_overflow_is_noop():
    from tpusplat.parallel.mesh import make_render_mesh
    from tpusplat.parallel.sharded import params_sharding, sharded_train_step
    from tpusplat.train.step import create_train_state, make_optimizer
    from tpusplat.types import stack_cameras

    params, cam = _setup(n=512)
    params = dataclasses.replace(params, log_scales=params.log_scales + 2.5)
    cams = stack_cameras([cam, cam])
    targets = jnp.zeros((2, cam.height, cam.width, 3), jnp.float32)
    optimizer = make_optimizer()
    mesh = make_render_mesh(data=2, tile=4)

    tiny = RenderConfig(sh_degree=1, capacity=256, max_per_tile=2048,
                        tile_chunk=4, gauss_chunk=16)
    state = create_train_state(params, optimizer)
    state = dataclasses.replace(
        state, params=jax.device_put(state.params, params_sharding(mesh)))
    means0 = np.asarray(state.params.means)
    state1, metrics = sharded_train_step(
        state, cams, targets, tiny, optimizer, mesh)
    assert int(np.asarray(metrics["capacity_overflow"]).sum()) > 0
    assert int(state1.step) == 0
    np.testing.assert_array_equal(np.asarray(state1.params.means), means0)
