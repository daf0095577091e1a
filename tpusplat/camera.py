"""Camera matrix construction with reference parity.

Reproduces ``Renderer::updateUniforms`` (``src/Renderer.cpp:719-754``):

  * ``view = inverse(translate(pos) * mat4_cast(rot))`` — i.e. world-to-camera
    for a camera posed by (position, quaternion);
  * ``proj = glm::perspective(fovy, aspect, near, far) * view`` computed with
    the *unflipped* view;
  * then ``view`` gets rows 1 and 2 (y, z) negated and ``proj`` gets row 1
    negated. (glm stores column-major; ``m[c][r] *= -1`` over all columns c
    for fixed r is a row negation of the math matrix.)

``tan_fovx = tan(radians(fov)/2)`` and ``tan_fovy = tan_fovx * h / w``
exactly as at ``src/Renderer.cpp:728-729``.
"""

from __future__ import annotations

import numpy as np

from tpusplat.types import Camera


def quat_to_rotmat(q: np.ndarray) -> np.ndarray:
    """Rotation matrix from a (w, x, y, z) quaternion, standard convention.

    Matches ``glm::mat4_cast`` and (transposed storage aside) the shader's
    ``rotationFromQuaternion`` (``common.glsl:50-74``): the shader builds
    column c = standard row c, and consumes it in transposed positions, so
    the effective math is the standard R.
    """
    q = np.asarray(q, np.float64)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = np.sqrt(w * w + x * x + y * y + z * z)
    w, x, y, z = w / n, x / n, y / n, z / n
    return np.stack(
        [
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            np.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            np.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )


def perspective(tan_fovy: float, aspect: float, near: float, far: float) -> np.ndarray:
    """glm::perspective (right-handed, [-1, 1] clip depth — glm's default)."""
    p = np.zeros((4, 4), np.float64)
    p[0, 0] = 1.0 / (aspect * tan_fovy)
    p[1, 1] = 1.0 / tan_fovy
    p[2, 2] = -(far + near) / (far - near)
    p[2, 3] = -(2.0 * far * near) / (far - near)
    p[3, 2] = -1.0
    return p


_FLIP_YZ = np.diag([1.0, -1.0, -1.0, 1.0])  # negate rows 1,2 (view)
_FLIP_Y = np.diag([1.0, -1.0, 1.0, 1.0])  # negate row 1 (proj)


def make_camera(
    position,
    rotation_quat_wxyz,
    width: int,
    height: int,
    fov_deg: float = 45.0,
    near: float = 0.2,
    far: float = 1000.0,
) -> Camera:
    """Build a Camera exactly as the reference viewer does.

    Defaults mirror ``RendererConfiguration`` (``include/3dgs/3dgs.h:13-25``:
    fov=45, near=0.2, far=1000).
    """
    pos = np.asarray(position, np.float64)
    rot = quat_to_rotmat(np.asarray(rotation_quat_wxyz, np.float64))

    # view = inverse(translate(pos) @ rot4) = rot.T @ translate(-pos)
    view = np.eye(4)
    view[:3, :3] = rot.T
    view[:3, 3] = rot.T @ (-pos)

    tan_fovx = np.tan(np.radians(fov_deg) / 2.0)
    tan_fovy = tan_fovx * height / width
    proj = perspective(tan_fovy, width / height, near, far) @ view

    return Camera.from_matrices(
        view=_FLIP_YZ @ view,
        proj=_FLIP_Y @ proj,
        cam_pos=pos,
        tan_fovx=tan_fovx,
        tan_fovy=tan_fovy,
        width=width,
        height=height,
    )


def camera_from_world_view(
    view_world_to_cam,
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    near: float = 0.2,
    far: float = 1000.0,
) -> Camera:
    """Build a Camera from an arbitrary world-to-camera matrix (e.g. COLMAP).

    The matrix must map world points to a camera frame with +x right,
    +y up, -z forward (OpenGL convention), i.e. the same frame
    ``make_camera`` produces before the shader-space flips.
    """
    view = np.asarray(view_world_to_cam, np.float64)
    cam_pos = -view[:3, :3].T @ view[:3, 3]
    proj = perspective(tan_fovy, tan_fovx / tan_fovy, near, far) @ view
    return Camera.from_matrices(
        view=_FLIP_YZ @ view,
        proj=_FLIP_Y @ proj,
        cam_pos=cam_pos,
        tan_fovx=tan_fovx,
        tan_fovy=tan_fovy,
        width=width,
        height=height,
    )


def look_at_camera(
    eye,
    target,
    width: int,
    height: int,
    up=(0.0, 1.0, 0.0),
    fov_deg: float = 45.0,
    near: float = 0.2,
    far: float = 1000.0,
) -> Camera:
    """Convenience: camera at ``eye`` looking at ``target`` (OpenGL frame)."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)

    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, fwd)

    # Camera basis: columns are camera axes in world space (-z forward).
    rot = np.stack([right, true_up, -fwd], axis=1)
    view = np.eye(4)
    view[:3, :3] = rot.T
    view[:3, 3] = rot.T @ (-eye)

    tan_fovx = np.tan(np.radians(fov_deg) / 2.0)
    tan_fovy = tan_fovx * height / width
    proj = perspective(tan_fovy, width / height, near, far) @ view
    return Camera.from_matrices(
        view=_FLIP_YZ @ view,
        proj=_FLIP_Y @ proj,
        cam_pos=eye,
        tan_fovx=tan_fovx,
        tan_fovy=tan_fovy,
        width=width,
        height=height,
    )
