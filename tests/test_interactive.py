"""Interactive viewer loop, driven end-to-end by scripted keystrokes
(the GLFW input loop + GUI metrics parity rows: GLFWWindow.cpp:56-79,
GUIManager.cpp:45-100, Renderer.cpp:428-450)."""

import io

import numpy as np

from tpusplat.config import RenderConfig
from tpusplat.interactive import ansi_frame, run_interactive
from tpusplat.io.synthetic import random_scene
from tpusplat.session import Session, SessionConfig


def _session(w=64, h=48):
    cfg = SessionConfig(
        width=w, height=h,
        render=RenderConfig(sh_degree=1, capacity_mult=32, max_per_tile=512,
                            tile_chunk=4, gauss_chunk=16),
    )
    s = Session(cfg, params=random_scene(300, seed=2, sh_degree=1,
                                         scale_range=(0.05, 0.3)))
    s.position = np.array([0.0, 0.0, 6.0])
    return s


def test_scripted_session_moves_and_renders():
    s = _session()
    out = io.StringIO()
    # forward x2, strafe right, look left, idle tick, quit.
    stats = run_interactive(
        s, keys=["w", "w", "d", "left", None, "q"], out=out, cols=32)
    assert stats["frames"] == 4  # one per input; the idle tick re-renders nothing
    # Motion: two forward steps (-z) then one right (+x) from identity
    # rotation, then a rotation (no translation).
    assert abs(stats["position"][2] - (6.0 - 0.6)) < 1e-6
    assert abs(stats["position"][0] - 0.3) < 1e-6
    text = out.getvalue()
    assert "instances" in text and "fps" in text
    assert "\x1b[38;2;" in text  # ANSI truecolor frame emitted


def test_idle_ticks_do_not_rerender():
    s = _session()
    out = io.StringIO()
    stats = run_interactive(
        s, keys=[None, None, None, "q"], out=out, cols=16)
    assert stats["frames"] == 1  # initial frame only; idle ticks are free


def test_max_frames_stops_loop():
    s = _session()
    out = io.StringIO()
    stats = run_interactive(
        s, keys=iter(["w"] * 100), out=out, cols=16, max_frames=3)
    assert stats["frames"] == 3


def test_rotation_changes_view():
    s = _session()
    out = io.StringIO()
    run_interactive(s, keys=["right", "q"], out=out, cols=16,
                    show_image=False)
    # 25 px * 0.005 rad = 0.125 rad yaw; quaternion no longer identity.
    assert abs(s.rotation[0] - 1.0) > 1e-3


def test_ansi_frame_shape():
    img = np.linspace(0, 1, 32 * 16 * 3).reshape(16, 32, 3)
    text = ansi_frame(img, cols=16)
    lines = text.split("\n")
    assert all(line.endswith("\x1b[0m") for line in lines)
    assert len(lines) >= 2


def test_stage_metrics_overlay_and_draw_profiled():
    """Per-stage metrics (GUIManager's live stage-time rows,
    src/GUIManager.cpp:45-100): draw_profiled returns the three stage
    times, and the interactive overlay surfaces them on sampled frames."""
    s = _session()
    s.initialize()
    img, aux, stage_ms = s.draw_profiled()
    assert set(stage_ms) == {"preprocess", "bin+sort", "raster"}
    assert all(v >= 0.0 for v in stage_ms.values())
    assert np.isfinite(np.asarray(img)).all()
    assert "num_instances" in aux

    s2 = _session()
    out = io.StringIO()
    run_interactive(s2, keys=["w", "w", "w", "q"], out=out, cols=32,
                    profile_every=2)
    text = out.getvalue()
    assert "stages" in text and "raster" in text
