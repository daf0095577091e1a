"""Pallas rasterizer (interpret mode on CPU) vs the XLA path: forward and
gradient parity. On TPU the same kernels run compiled; the interpreter
executes identical semantics (SURVEY.md §5 race-detection row)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusplat.camera import look_at_camera
from tpusplat.config import RenderConfig
from tpusplat.io.synthetic import random_scene
from tpusplat.render import render_stages
from tpusplat.train.step import merge_trainable, split_trainable


def _setup(n=400, w=64, h=48, sh_degree=1, seed=6):
    params = random_scene(n, seed=seed, sh_degree=sh_degree, scale_range=(0.05, 0.3))
    cam = look_at_camera([0.3, 0.2, 6.0], [0, 0, 0], w, h, fov_deg=60.0)
    cfg_xla = RenderConfig(sh_degree=sh_degree, max_per_tile=512, tile_chunk=4,
                           gauss_chunk=16, use_pallas=False)
    cfg_pl = dataclasses.replace(cfg_xla, use_pallas=True)
    return params, cam, cfg_xla, cfg_pl


def test_pallas_forward_matches_xla():
    params, cam, cfg_xla, cfg_pl = _setup()
    img_x, aux_x = render_stages(params, cam, cfg_xla)
    img_p, aux_p = render_stages(params, cam, cfg_pl)
    assert int(aux_p["capacity_overflow"]) == 0
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(aux_p["transmittance"]), np.asarray(aux_x["transmittance"]),
        atol=3e-5,
    )


def test_pallas_forward_dense_overlap():
    # Big scales -> hundreds of instances per tile, multiple windows/chunks.
    params, cam, cfg_xla, cfg_pl = _setup(n=800, w=32, h=32)
    params = dataclasses.replace(params, log_scales=params.log_scales + 1.5)
    cfg_xla = dataclasses.replace(cfg_xla, max_per_tile=1024)
    img_x, _ = render_stages(params, cam, cfg_xla)
    img_p, _ = render_stages(params, cam, cfg_pl)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x), atol=1e-4, rtol=1e-3)


def test_pallas_grads_match_xla():
    params, cam, cfg_xla, cfg_pl = _setup()
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.uniform(0, 1, (cam.height, cam.width, 3)), jnp.float32)
    trainable, alive = split_trainable(params)

    def loss(tr, cfg):
        img, _ = render_stages(merge_trainable(tr, alive), cam, cfg)
        return jnp.mean((img - target) ** 2)

    g_x = jax.grad(loss)(trainable, cfg_xla)
    g_p = jax.grad(loss)(trainable, cfg_pl)
    for f in ("means", "log_scales", "quats", "opacities", "sh"):
        a = np.asarray(g_x[f], np.float64)
        b = np.asarray(g_p[f], np.float64)
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-4, err_msg=f)


def test_pallas_transmittance_cotangent():
    """The dT channel of the VJP (used when a loss reads transmittance)."""
    params, cam, cfg_xla, cfg_pl = _setup(n=150, w=32, h=32)
    trainable, alive = split_trainable(params)

    def loss(tr, cfg):
        _, aux = render_stages(merge_trainable(tr, alive), cam, cfg)
        return jnp.mean(aux["transmittance"])

    g_x = jax.grad(loss)(trainable, cfg_xla)
    g_p = jax.grad(loss)(trainable, cfg_pl)
    for f in ("means", "opacities", "log_scales"):
        a = np.asarray(g_x[f], np.float64)
        b = np.asarray(g_p[f], np.float64)
        scale = np.abs(a).max() + 1e-12
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-4, err_msg=f)
