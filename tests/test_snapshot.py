"""Rendered-image regression snapshot: catches silent semantic drift in any
pipeline stage across refactors (the golden-oracle tests catch divergence
from the reference; this catches divergence from ourselves)."""

import numpy as np

from tpusplat.camera import look_at_camera
from tpusplat.config import RenderConfig
from tpusplat.io.synthetic import random_scene
from tpusplat.render import render_stages


def test_render_matches_snapshot():
    params = random_scene(400, seed=11, sh_degree=2, scale_range=(0.05, 0.25))
    cam = look_at_camera([0.5, 0.3, 6.0], [0, 0, 0], 96, 64, fov_deg=60.0)
    cfg = RenderConfig(sh_degree=2, max_per_tile=256, tile_chunk=4)
    img, _ = render_stages(params, cam, cfg)
    import pathlib

    ref = np.load(pathlib.Path(__file__).parent / "golden_snapshot.npz")["image"]
    np.testing.assert_allclose(np.asarray(img), ref, atol=5e-5, rtol=1e-4)
