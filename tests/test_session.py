"""Session facade: lifecycle, draw, and input-motion semantics
(VulkanSplatting API analogue, include/3dgs/3dgs.h:11-51)."""

import numpy as np

from tpusplat.config import RenderConfig
from tpusplat.io.ply import save_ply
from tpusplat.io.synthetic import random_scene
from tpusplat.session import Session, SessionConfig


def _session(tmp_path, **render_kw):
    params = random_scene(300, seed=1, sh_degree=0)
    path = tmp_path / "s.ply"
    save_ply(path, params)
    cfg = SessionConfig(
        scene=str(path), width=64, height=48,
        render=RenderConfig(sh_degree=0, max_per_tile=256, tile_chunk=4, **render_kw),
    )
    return Session(cfg)


def test_initialize_draw_stop(tmp_path):
    s = _session(tmp_path)
    s.initialize()
    s.position = np.array([0.0, 0.0, 6.0])
    s.log_translation(np.pi / 0.005, 0.0)  # turn around to face the scene
    img, aux = s.draw()
    assert np.asarray(img).shape == (48, 64, 3)
    assert np.isfinite(np.asarray(img)).all()
    s.stop()


def test_start_loop_runs_frames(tmp_path):
    s = _session(tmp_path)
    seen = []
    s.position = np.array([0.0, 0.0, 6.0])
    s.start(on_frame=lambda img, aux: seen.append(1) and None, max_frames=3)
    assert len(seen) == 3


def test_movement_in_camera_frame(tmp_path):
    s = _session(tmp_path)
    s.initialize()
    # Identity rotation: forward is -z, step 0.3 (src/Renderer.cpp:81).
    s.log_movement(0, 0, -1)
    np.testing.assert_allclose(s.position, [0, 0, -0.3], atol=1e-12)
    # Yaw 90 degrees: camera forward maps toward -x.
    s.position[:] = 0
    s.log_translation(-(np.pi / 2) / 0.005, 0.0)
    s.log_movement(0, 0, -1)
    np.testing.assert_allclose(s.position, [-0.3, 0, 0], atol=1e-6)


def test_rotation_rate_matches_reference(tmp_path):
    s = _session(tmp_path)
    s.log_translation(1.0, 0.0)  # one pixel -> 0.005 rad about (0,-1,0)
    ang = 2 * np.arccos(np.clip(s.rotation[0], -1, 1))
    np.testing.assert_allclose(ang, 0.005, rtol=1e-6)
    assert s.rotation[2] < 0  # axis (0,-1,0)


def test_resize_mid_session(tmp_path):
    """Mid-session resolution change (swapchain-recreation analogue,
    src/Renderer.cpp:102-117): the next draw re-jits on the new static
    shape and matches a session created at that size from scratch."""
    s = _session(tmp_path)
    s.initialize()
    s.position = np.array([0.0, 0.0, 6.0])
    s.log_translation(np.pi / 0.005, 0.0)
    img0, _ = s.draw()
    assert np.asarray(img0).shape == (48, 64, 3)

    s.resize(96, 80)
    img1, aux1 = s.draw()
    assert np.asarray(img1).shape == (80, 96, 3)
    assert np.isfinite(np.asarray(img1)).all()

    # Equivalent to rendering at the new size directly (same camera state).
    fresh = _session(tmp_path)
    fresh.initialize()
    fresh.config = __import__("dataclasses").replace(
        fresh.config, width=96, height=80)
    fresh.position = s.position.copy()
    fresh.rotation = s.rotation.copy()
    img2, _ = fresh.draw()
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-6)

    # And back: the original-size executable is still cached.
    s.resize(64, 48)
    img3, _ = s.draw()
    np.testing.assert_allclose(np.asarray(img3), np.asarray(img0), atol=1e-6)
