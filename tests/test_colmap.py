"""COLMAP binary ingestion tests.

The test writes its own tiny COLMAP sparse model (cameras.bin / images.bin /
points3D.bin in the exact binary layout of COLMAP's reconstruction_io.cc),
reads it back through tpusplat.io.colmap, and checks both the parse and the
geometry: a point straight ahead of a COLMAP camera must land at the image
center of the converted Camera and at positive view depth.
"""

import struct

import numpy as np

from tpusplat.config import RenderConfig
from tpusplat.io import colmap
from tpusplat.ops.preprocess import preprocess


def _write_cameras_bin(path, cams):
    # cams: list of (camera_id, model_id, width, height, params)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cams)))
        for cid, model_id, w, h, params in cams:
            f.write(struct.pack("<iiQQ", cid, model_id, w, h))
            f.write(struct.pack(f"<{len(params)}d", *params))


def _write_images_bin(path, images):
    # images: list of (image_id, qvec, tvec, camera_id, name, points2d)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for iid, qvec, tvec, cid, name, pts2d in images:
            f.write(struct.pack("<i", iid))
            f.write(struct.pack("<4d", *qvec))
            f.write(struct.pack("<3d", *tvec))
            f.write(struct.pack("<i", cid))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", len(pts2d)))
            for x, y, pid in pts2d:
                f.write(struct.pack("<ddq", x, y, pid))


def _write_points3d_bin(path, points):
    # points: list of (pid, xyz, rgb, error, track)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(points)))
        for pid, xyz, rgb, err, track in points:
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<3d", *xyz))
            f.write(struct.pack("<3B", *rgb))
            f.write(struct.pack("<d", err))
            f.write(struct.pack("<Q", len(track)))
            for img_id, p2d in track:
                f.write(struct.pack("<ii", img_id, p2d))


def _make_fixture(tmp_path):
    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    w, h = 640, 480
    fx, fy, cx, cy = 500.0, 480.0, 320.0, 240.0
    _write_cameras_bin(sparse / "cameras.bin", [
        (1, 1, w, h, [fx, fy, cx, cy]),          # PINHOLE
        (2, 0, 320, 240, [260.0, 160.0, 120.0]),  # SIMPLE_PINHOLE
    ])
    # Image 1: identity pose (camera at origin looking along COLMAP +z).
    # Image 2: camera translated to (0, 0, -2) world (tvec = -R @ C = (0,0,2)).
    _write_images_bin(sparse / "images.bin", [
        (7, [1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0], 1, "b_second.png",
         [(12.0, 34.0, 99)]),
        (3, [1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 2.0], 2, "a_first.png", []),
    ])
    _write_points3d_bin(sparse / "points3D.bin", [
        (0, [0.0, 0.0, 5.0], [255, 128, 0], 0.5, [(7, 0), (3, 1)]),
        (1, [1.0, -1.0, 6.0], [10, 200, 30], 1.0, []),
        (2, [-1.0, 0.5, 4.0], [0, 0, 255], 0.2, []),
    ])
    return tmp_path, (w, h, fx, fy)


def test_parse_roundtrip(tmp_path):
    root, (w, h, fx, fy) = _make_fixture(tmp_path)
    cams = colmap.read_cameras_bin(str(root / "sparse" / "0" / "cameras.bin"))
    assert cams[1].model == "PINHOLE" and cams[1].width == w
    assert cams[1].focal == (fx, fy)
    assert cams[2].model == "SIMPLE_PINHOLE" and cams[2].focal == (260.0, 260.0)

    images = colmap.read_images_bin(str(root / "sparse" / "0" / "images.bin"))
    assert [im.name for im in images] == ["a_first.png", "b_second.png"]
    assert images[0].camera_id == 2
    np.testing.assert_allclose(images[0].tvec, [0.0, 0.0, 2.0])

    xyz, rgb = colmap.read_points3d_bin(
        str(root / "sparse" / "0" / "points3D.bin"))
    assert xyz.shape == (3, 3) and rgb.shape == (3, 3)
    np.testing.assert_allclose(xyz[0], [0.0, 0.0, 5.0])
    assert tuple(rgb[0]) == (255, 128, 0)


def test_geometry_center_projection(tmp_path):
    """A point straight ahead of the identity-pose COLMAP camera projects to
    the image center with positive view depth (shader frame)."""
    root, (w, h, fx, fy) = _make_fixture(tmp_path)
    cams, names, init = colmap.load_colmap_scene(str(root))
    cam = cams[names.index("b_second.png")]
    assert cam.width == w and cam.height == h
    np.testing.assert_allclose(float(cam.tan_fovx), w / (2 * fx), rtol=1e-6)
    np.testing.assert_allclose(float(cam.tan_fovy), h / (2 * fy), rtol=1e-6)

    pg = preprocess(init, cam, RenderConfig(sh_degree=0))
    # Point 0 is at (0,0,5) along the COLMAP optical axis -> depth 5,
    # pixel-center coordinates ((w-1)/2, (h-1)/2) per ndc2Pix.
    np.testing.assert_allclose(float(pg.depth[0]), 5.0, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pg.uv[0]), [(w - 1) / 2, (h - 1) / 2], atol=1e-2)
    # Point 1 at (1,-1,6): x right -> right half; COLMAP +y down -> y=-1 is
    # UP in the image -> smaller row index than center.
    assert float(pg.uv[1, 0]) > (w - 1) / 2
    assert float(pg.uv[1, 1]) < (h - 1) / 2
    assert bool(pg.ntiles[0] > 0)


def test_second_camera_depth(tmp_path):
    root, _ = _make_fixture(tmp_path)
    cams, names, init = colmap.load_colmap_scene(str(root))
    cam2 = cams[names.index("a_first.png")]
    # Camera center at world (0,0,-2): point (0,0,5) sits 7 units ahead.
    pg = preprocess(init, cam2, RenderConfig(sh_degree=0))
    np.testing.assert_allclose(float(pg.depth[0]), 7.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cam2.cam_pos), [0, 0, -2], atol=1e-6)


def test_init_from_points(tmp_path):
    root, _ = _make_fixture(tmp_path)
    _, _, init = colmap.load_colmap_scene(str(root))
    assert init.num_gaussians == 3
    # SH DC encodes the point colour: color = SH_C0 * dc + 0.5 = rgb/255.
    from tpusplat.config import SH_C0

    rgb0 = SH_C0 * np.asarray(init.sh[0, 0]) + 0.5
    np.testing.assert_allclose(rgb0, [1.0, 128 / 255, 0.0], atol=1e-6)
    assert np.all(np.asarray(init.sh[:, 1:]) == 0)
    # Scales: isotropic log of mean 3-NN distance, finite and positive.
    s = np.exp(np.asarray(init.log_scales))
    assert np.all(np.isfinite(s)) and np.all(s > 0)
    assert np.all(s[:, 0] == s[:, 1]) and np.all(s[:, 0] == s[:, 2])
    # Opacity activates to the 3DGS init value 0.1.
    np.testing.assert_allclose(
        1 / (1 + np.exp(-np.asarray(init.opacities))), 0.1, rtol=1e-5)


def test_downscale(tmp_path):
    root, (w, h, fx, fy) = _make_fixture(tmp_path)
    cams, names = colmap.load_colmap_cameras(
        str(root / "sparse" / "0"), downscale=2)
    cam = cams[names.index("b_second.png")]
    assert cam.width == w // 2 and cam.height == h // 2
    # tan_fov is resolution-invariant.
    np.testing.assert_allclose(float(cam.tan_fovx), w / (2 * fx), rtol=1e-6)
