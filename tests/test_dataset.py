"""Dataset IO: npz view round-trip, NeRF-synthetic transforms parsing, and
the dependency-free PNG codec pair."""

import json

import numpy as np

from tpusplat.camera import look_at_camera
from tpusplat.io.dataset import _read_png, load_nerf_synthetic, load_views, save_view


def test_view_roundtrip(tmp_path):
    cam = look_at_camera([1, 2, 3], [0, 0, 0], 64, 48)
    img = np.random.default_rng(0).uniform(0, 1, (48, 64, 3)).astype(np.float32)
    save_view(tmp_path / "v0.npz", cam, img)
    cams, images = load_views(str(tmp_path))
    assert len(cams) == 1
    np.testing.assert_allclose(np.asarray(cams[0].view), np.asarray(cam.view))
    np.testing.assert_array_equal(images[0], img)
    assert cams[0].width == 64 and cams[0].height == 48


def test_png_roundtrip(tmp_path):
    import sys

    sys.path.insert(0, "apps")
    from viewer import save_png

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (17, 23, 3)).astype(np.float32)
    save_png(tmp_path / "x.png", img)
    back = _read_png(str(tmp_path / "x.png"))
    expect = np.round(np.clip(img, 0, 1) * 255) / 255.0
    np.testing.assert_allclose(back, expect, atol=1 / 255.0 + 1e-6)


def test_nerf_synthetic_loader(tmp_path):
    import sys

    sys.path.insert(0, "apps")
    from viewer import save_png

    # Build a tiny fake dataset: one camera at +z looking at origin.
    img = np.zeros((32, 32, 3), np.float32)
    img[8:24, 8:24] = 0.5
    save_png(tmp_path / "r0.png", img)
    c2w = np.eye(4)
    c2w[2, 3] = 4.0  # camera at z=+4, looking down -z (OpenGL)
    meta = dict(camera_angle_x=0.8, frames=[
        dict(file_path="r0", transform_matrix=c2w.tolist()),
    ])
    (tmp_path / "transforms_train.json").write_text(json.dumps(meta))

    cams, images = load_nerf_synthetic(str(tmp_path), "train")
    assert len(cams) == 1
    np.testing.assert_allclose(images[0], np.round(img * 255) / 255, atol=1e-6)
    cam = cams[0]
    # A point at the origin must project to the image center, depth 4.
    p = np.array([0.0, 0.0, 0.0, 1.0])
    pv = np.asarray(cam.view) @ p
    assert np.isclose(pv[2], 4.0, atol=1e-6)
    ph = np.asarray(cam.proj) @ p
    np.testing.assert_allclose(ph[:2] / ph[3], 0.0, atol=1e-6)
