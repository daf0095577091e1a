"""Interactive rendering session — the ``VulkanSplatting`` facade analogue.

Reproduces the reference's public API shape (``include/3dgs/3dgs.h:11-51``):
a configuration struct, an ``initialize()`` / repeated ``draw()`` embedding
contract (the iOS CADisplayLink path, SURVEY.md §3.4), a self-driving
``start()`` loop, and the input-forwarding hooks ``log_translation`` (cursor
deltas -> camera rotation) and ``log_movement`` (direction -> camera-frame
translation), with the reference's exact motion constants
(``src/Renderer.cpp:33-83``: 0.005 rad/px around (0,-1,0)/( -1,0,0), step
0.3 in the camera frame).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import numpy as np

from tpusplat.camera import make_camera, quat_to_rotmat
from tpusplat.config import RenderConfig
from tpusplat.io.ply import load_ply
from tpusplat.render import render_stages
from tpusplat.types import GaussianParams


def _quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def _axis_angle_quat(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    s = np.sin(angle / 2.0)
    return np.array([np.cos(angle / 2.0), *(axis * s)])


@dataclasses.dataclass
class SessionConfig:
    """RendererConfiguration analogue (include/3dgs/3dgs.h:13-25)."""

    scene: str = ""
    width: int = 1280
    height: int = 720
    fov: float = 45.0
    near: float = 0.2
    far: float = 1000.0
    render: RenderConfig = dataclasses.field(default_factory=RenderConfig)


class Session:
    """Holds camera state and renders frames on demand.

    Usage (externally-driven, like the iOS shim):
        s = Session(SessionConfig(scene="garden.ply"))
        s.initialize()
        img = s.draw()
        s.log_translation(dx, dy)   # cursor deltas
        s.log_movement(0, 0, -1)    # key direction (camera frame)

    or self-driving: ``s.start(frame_callback, max_frames=...)``.
    """

    def __init__(self, config: SessionConfig, params: GaussianParams | None = None):
        self.config = config
        self.params = params
        self.position = np.zeros(3)
        self.rotation = np.array([1.0, 0.0, 0.0, 0.0])  # (w,x,y,z)
        self._initialized = False

    # -- lifecycle (3dgs.h:27-41) --

    def initialize(self):
        if self.params is None:
            self.params = load_ply(self.config.scene)
        self._initialized = True

    def draw(self):
        """Render one frame at the current camera; returns ([H,W,3], aux).

        On instance-capacity overflow the frame is automatically retried
        with a grown capacity (the reference's sort-buffer growth + retry,
        ``src/Renderer.cpp:541-563``); the grown config is kept for
        subsequent frames.
        """
        assert self._initialized, "call initialize() first"
        cam = make_camera(
            self.position, self.rotation, self.config.width, self.config.height,
            fov_deg=self.config.fov, near=self.config.near, far=self.config.far,
        )
        from tpusplat.render import render_auto

        img, aux, grown = render_auto(self.params, cam, self.config.render)
        if grown is not self.config.render:
            import dataclasses

            self.config = dataclasses.replace(self.config, render=grown)
        return img, aux

    def draw_profiled(self):
        """Like draw(), but returns (img, aux, stage_ms) with per-stage times.

        The per-stage metrics source for the viewer overlay (the reference
        shows live preprocess/sort/render ms from Vulkan timestamp queries,
        ``src/GUIManager.cpp:45-100``). Stage fences make this frame a bit
        slower than draw(); sample it periodically.
        """
        assert self._initialized, "call initialize() first"
        from tpusplat.render import render_profiled

        cam = make_camera(
            self.position, self.rotation, self.config.width, self.config.height,
            fov_deg=self.config.fov, near=self.config.near, far=self.config.far,
        )
        return render_profiled(self.params, cam, self.config.render)

    def resize(self, width: int, height: int):
        """Change the render resolution mid-session.

        The analogue of the reference's swapchain recreation on resize
        (``src/Renderer.cpp:102-117``: recreate swapchain, realloc the
        tile-boundary buffer for the new grid, re-record, rebuild the
        render pipeline). Here the image shape is jit-static, so the next
        ``draw()`` compiles a fresh executable for the new tile grid —
        same recovery, no explicit resource management. Previous-size
        executables stay cached, so toggling between sizes is free after
        the first visit.
        """
        self.config = dataclasses.replace(
            self.config, width=int(width), height=int(height)
        )

    def start(self, on_frame: Callable | None = None, max_frames: int = 0,
              target_fps: float = 0.0):
        """Self-driving loop (Renderer::run analogue, src/Renderer.cpp:428-450)."""
        self.initialize()
        frames = 0
        t_last = time.time()
        while max_frames == 0 or frames < max_frames:
            img, aux = self.draw()
            frames += 1
            if on_frame is not None and on_frame(img, aux) is False:
                break
            if target_fps > 0:
                dt = time.time() - t_last
                if dt < 1.0 / target_fps:
                    time.sleep(1.0 / target_fps - dt)
                t_last = time.time()
        self.stop()

    def stop(self):
        self._initialized = False

    # -- input forwarding (3dgs.h:43-45; motion math src/Renderer.cpp:44-82) --

    def log_translation(self, dx: float, dy: float):
        """Cursor deltas -> camera rotation, 0.005 rad per pixel."""
        self.rotation = _quat_mul(
            self.rotation, _axis_angle_quat([0.0, -1.0, 0.0], dx * 0.005)
        )
        self.rotation = _quat_mul(
            self.rotation, _axis_angle_quat([-1.0, 0.0, 0.0], dy * 0.005)
        )
        self.rotation /= np.linalg.norm(self.rotation)

    def log_movement(self, x: float, y: float, z: float):
        """Move along a camera-frame direction, step 0.3 (normalized)."""
        d = np.array([x, y, z], np.float64)
        n = np.linalg.norm(d)
        if n == 0:
            return
        self.position = self.position + quat_to_rotmat(self.rotation) @ (d / n) * 0.3
