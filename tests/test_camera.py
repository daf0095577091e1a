"""Camera matrix parity tests against hand-computed glm semantics
(src/Renderer.cpp:719-754)."""

import numpy as np

from tpusplat.camera import make_camera, perspective, quat_to_rotmat


def test_identity_camera_matrices():
    cam = make_camera([0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0], 640, 480, fov_deg=90.0)
    view = np.asarray(cam.view)
    # identity pose -> view = flip_yz
    np.testing.assert_allclose(view, np.diag([1.0, -1.0, -1.0, 1.0]), atol=1e-6)
    assert np.isclose(float(cam.tan_fovx), 1.0)
    assert np.isclose(float(cam.tan_fovy), 480.0 / 640.0)


def test_projection_point_through_pipeline():
    # A point straight ahead of the camera (reference camera looks along -z
    # in the unflipped frame) must land at the image center with depth = |z|.
    cam = make_camera([0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0], 800, 600, fov_deg=60.0)
    p = np.array([0.0, 0.0, -5.0, 1.0])
    p_view = np.asarray(cam.view) @ p
    assert np.isclose(p_view[2], 5.0, atol=1e-6)  # flipped z is positive depth
    p_hom = np.asarray(cam.proj) @ p
    ndc = p_hom[:3] / p_hom[3]
    assert np.allclose(ndc[:2], 0.0, atol=1e-6)
    # w equals flipped-view depth (used by preprocess guard)
    assert np.isclose(p_hom[3], 5.0, atol=1e-6)


def test_off_axis_point_ndc():
    # Point at the right edge of the frustum -> ndc.x == +1 (before y-flip).
    w, h = 640, 480
    cam = make_camera([0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0], w, h, fov_deg=90.0)
    tan_fovx = float(cam.tan_fovx)
    z = -3.0
    p = np.array([-z * tan_fovx, 0.0, z, 1.0])
    p_hom = np.asarray(cam.proj) @ p
    ndc = p_hom[:3] / p_hom[3]
    assert np.isclose(ndc[0], 1.0, atol=1e-5)

    # Point above center: unflipped ndc.y would be +, the reference's row-1
    # flip makes it negative (y-down image space).
    tan_fovy = float(cam.tan_fovy)
    p = np.array([0.0, -z * tan_fovy * 0.5, z, 1.0])
    p_hom = np.asarray(cam.proj) @ p
    ndc = p_hom[:3] / p_hom[3]
    assert np.isclose(ndc[1], -0.5, atol=1e-5)


def test_quat_rotmat_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    r = quat_to_rotmat(q)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(r), 1.0)


def test_perspective_matches_glm():
    # glm::perspective reference values for fovy=2*atan(0.5), aspect 4/3.
    t = 0.5
    p = perspective(t, 4.0 / 3.0, 0.2, 1000.0)
    assert np.isclose(p[0, 0], 1.0 / (4.0 / 3.0 * t))
    assert np.isclose(p[1, 1], 2.0)
    assert np.isclose(p[2, 2], -(1000.0 + 0.2) / (1000.0 - 0.2))
    assert np.isclose(p[2, 3], -(2 * 1000.0 * 0.2) / (1000.0 - 0.2))
    assert p[3, 2] == -1.0


def test_rotated_camera_view_consistency():
    # 90-degree yaw: camera looks along -x^w... verify via matrix action.
    ang = np.pi / 2
    q = [np.cos(ang / 2), 0.0, np.sin(ang / 2), 0.0]  # yaw about +y
    cam = make_camera([1.0, 2.0, 3.0], q, 640, 480)
    # The camera center must map to the origin of view space.
    c = np.array([1.0, 2.0, 3.0, 1.0])
    np.testing.assert_allclose((np.asarray(cam.view) @ c)[:3], 0.0, atol=1e-6)
