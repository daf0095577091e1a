"""End-to-end forward parity: XLA tile pipeline vs the sequential golden
oracle (BASELINE.json config-1 scale)."""

import numpy as np
import pytest

from tpusplat.camera import look_at_camera
from tpusplat.config import RenderConfig
from tpusplat.io.synthetic import random_scene
from tpusplat.ops.golden import golden_render
from tpusplat.render import render_stages


@pytest.mark.parametrize(
    "n,w,h,sh_degree,seed",
    [
        (300, 128, 128, 0, 0),
        (1000, 160, 120, 3, 1),  # non-divisible height exercises tile crop
    ],
)
def test_forward_matches_golden(n, w, h, sh_degree, seed):
    params = random_scene(n, seed=seed, sh_degree=sh_degree)
    cam = look_at_camera([0.0, 0.5, 7.0], [0.0, 0.0, 0.0], w, h, fov_deg=55.0)
    cfg = RenderConfig(sh_degree=sh_degree, max_per_tile=512, tile_chunk=16)

    img, aux = render_stages(params, cam, cfg)
    img = np.asarray(img)
    assert int(aux["capacity_overflow"]) == 0
    assert int(aux["tile_overflow"]) == 0

    gold = golden_render(params, cam, cfg)

    assert img.shape == gold.shape
    # Elementwise float tolerance: the pipeline accumulates via cumprod
    # (different association than the sequential loop).
    np.testing.assert_allclose(img, gold, atol=2e-4, rtol=1e-3)


def test_nonempty_image():
    params = random_scene(500, seed=2)
    cam = look_at_camera([0, 0, 7.0], [0, 0, 0], 128, 128)
    img, aux = render_stages(params, cam, RenderConfig(max_per_tile=512))
    img = np.asarray(img)
    assert img.max() > 0.05
    assert int(aux["num_instances"]) > 0
    assert np.isfinite(img).all()


def test_empty_scene_black_image():
    params = random_scene(100, seed=2)
    # move the whole scene behind the camera
    import dataclasses

    params = dataclasses.replace(params, means=np.asarray(params.means) + np.float32(100.0))
    cam = look_at_camera([0, 0, 7.0], [0, 0, 0], 64, 64)
    img, aux = render_stages(params, cam, RenderConfig(max_per_tile=64))
    assert np.asarray(img).max() == 0.0
    assert int(aux["num_instances"]) == 0


def test_render_batch_matches_individual():
    import jax

    from tpusplat.render import render_batch
    from tpusplat.types import stack_cameras

    params = random_scene(200, seed=3, sh_degree=0)
    cams = stack_cameras(
        [look_at_camera([i - 1.0, 0, 6.0], [0, 0, 0], 64, 64) for i in range(3)]
    )
    cfg = RenderConfig(sh_degree=0, max_per_tile=128, tile_chunk=4)
    batch = np.asarray(jax.jit(render_batch, static_argnames="cfg")(params, cams, cfg))
    for i in range(3):
        cam = jax.tree_util.tree_map(lambda x: x[i], cams)
        ref, _ = render_stages(params, cam, cfg)
        np.testing.assert_allclose(batch[i], np.asarray(ref), atol=1e-6)
