"""PLY round-trip and synthetic scene tests."""

import numpy as np

from tpusplat.io.ply import load_ply, save_ply
from tpusplat.io.synthetic import random_scene


def test_ply_roundtrip(tmp_path):
    params = random_scene(257, seed=7)
    path = tmp_path / "scene.ply"
    save_ply(path, params)
    loaded = load_ply(path, use_native=False)
    np.testing.assert_allclose(np.asarray(loaded.means), np.asarray(params.means), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(loaded.log_scales), np.asarray(params.log_scales), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(loaded.quats), np.asarray(params.quats), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(loaded.opacities), np.asarray(params.opacities), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(loaded.sh), np.asarray(params.sh), rtol=1e-6)


def test_ply_sh_interleave_layout(tmp_path):
    """The on-disk layout is channel-planar; memory layout is interleaved
    (src/GSScene.cpp:47-55). Verify the exact byte positions."""
    params = random_scene(4, seed=0)
    path = tmp_path / "scene.ply"
    save_ply(path, params)
    raw = path.read_bytes()
    body = raw.split(b"end_header\n", 1)[1]
    rec = np.frombuffer(body, "<f4").reshape(4, 62)
    sh = np.asarray(params.sh)
    # DC: planar[0:3] == interleaved coeff 0
    np.testing.assert_array_equal(rec[:, 6:9], sh[:, 0, :])
    # rest: planar[3 + c*15 + (j-1)] == interleaved coeff j channel c
    for j in (1, 5, 15):
        for c in range(3):
            np.testing.assert_array_equal(rec[:, 6 + 3 + c * 15 + (j - 1)], sh[:, j, c])


def test_native_loader_matches_numpy(tmp_path):
    import subprocess
    import pathlib

    native_dir = pathlib.Path(__file__).parent.parent / "native"
    subprocess.run(["make", "-C", str(native_dir)], check=True, capture_output=True)

    params = random_scene(123, seed=3)
    path = tmp_path / "scene.ply"
    save_ply(path, params)
    a = load_ply(path, use_native=False)
    b = load_ply(path, use_native=True)
    np.testing.assert_array_equal(np.asarray(a.means), np.asarray(b.means))
    np.testing.assert_array_equal(np.asarray(a.sh), np.asarray(b.sh))


def test_random_scene_activations_in_range():
    p = random_scene(100, seed=1)
    scales = np.exp(np.asarray(p.log_scales))
    assert (scales > 0.005).all() and (scales < 0.2).all()
    op = 1 / (1 + np.exp(-np.asarray(p.opacities)))
    assert (op > 0.05).all() and (op < 0.97).all()
    qn = np.linalg.norm(np.asarray(p.quats), axis=1)
    np.testing.assert_allclose(qn, 1.0, rtol=1e-5)
