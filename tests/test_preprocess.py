"""Vectorized preprocess vs the sequential golden oracle."""

import numpy as np

from tpusplat.camera import look_at_camera
from tpusplat.config import RenderConfig
from tpusplat.io.synthetic import random_scene
from tpusplat.ops.golden import golden_preprocess
from tpusplat.ops.preprocess import compute_cov3d, preprocess


def _setup(n=500, seed=1, w=256, h=192, sh_degree=3):
    params = random_scene(n, seed=seed, sh_degree=sh_degree)
    cam = look_at_camera([0.0, 0.0, 8.0], [0.0, 0.0, 0.0], w, h, fov_deg=60.0)
    cfg = RenderConfig(sh_degree=sh_degree)
    return params, cam, cfg


def test_cov3d_identity_quat():
    log_scales = np.log(np.array([[0.5, 1.0, 2.0]], np.float32))
    quats = np.array([[1.0, 0.0, 0.0, 0.0]], np.float32)
    xx, xy, xz, yy, yz, zz = compute_cov3d(log_scales, quats)
    np.testing.assert_allclose(
        [float(xx[0]), float(yy[0]), float(zz[0])], [0.25, 1.0, 4.0], rtol=1e-6
    )
    np.testing.assert_allclose([float(xy[0]), float(xz[0]), float(yz[0])], 0.0, atol=1e-7)


def test_cov3d_rotation_invariants():
    rng = np.random.default_rng(3)
    n = 64
    log_scales = rng.uniform(-2, 0.5, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    xx, xy, xz, yy, yz, zz = compute_cov3d(log_scales, quats)
    # trace = sum of squared scales (rotation invariant)
    tr = np.asarray(xx + yy + zz)
    np.testing.assert_allclose(tr, np.sum(np.exp(log_scales) ** 2, -1), rtol=1e-4)
    # determinant = product of squared scales
    det = np.asarray(
        xx * (yy * zz - yz * yz) - xy * (xy * zz - yz * xz) + xz * (xy * yz - yy * xz)
    )
    np.testing.assert_allclose(det, np.prod(np.exp(log_scales) ** 2, -1), rtol=1e-3)


def test_preprocess_matches_golden():
    params, cam, cfg = _setup()
    pg = preprocess(params, cam, cfg)
    gold = golden_preprocess(params, cam, cfg)

    ntiles = np.asarray(pg.ntiles)
    np.testing.assert_array_equal(ntiles, gold["ntiles"])
    vis = ntiles > 0
    assert vis.sum() > 50, "test scene should have many visible gaussians"

    np.testing.assert_array_equal(np.asarray(pg.aabb)[vis], gold["aabb"][vis])
    np.testing.assert_allclose(np.asarray(pg.uv)[vis], gold["uv"][vis], atol=2e-3)
    np.testing.assert_allclose(np.asarray(pg.depth)[vis], gold["depth"][vis], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pg.conic)[vis], gold["conic"][vis], rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pg.color)[vis], gold["color"][vis], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pg.opacity)[vis], gold["opacity"][vis], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pg.radius)[vis], gold["radius"][vis], atol=1.0)
    # radius is a ceil of a float expression — allow off-by-one from rounding,
    # but require near-exact agreement in the vast majority of lanes.
    mismatch = (np.asarray(pg.radius)[vis] != gold["radius"][vis]).mean()
    assert mismatch < 0.01


def test_preprocess_culling_behind_camera():
    params, cam, cfg = _setup()
    # Scene centered at origin, camera at z=8 looking at origin: gaussians
    # behind the camera (z > 8) must be culled.
    means = np.asarray(params.means)
    pg = preprocess(params, cam, cfg)
    ntiles = np.asarray(pg.ntiles)
    behind = means[:, 2] > 8.0
    assert (ntiles[behind] == 0).all()


def test_sh_degree0_uses_dc_only():
    params, cam, _ = _setup(n=100, sh_degree=0)
    cfg = RenderConfig(sh_degree=0)
    pg = preprocess(params, cam, cfg)
    from tpusplat.config import SH_C0

    expect = SH_C0 * np.asarray(params.sh)[:, 0, :] + 0.5
    expect[:, 0] = np.maximum(expect[:, 0], 0.0)  # red-channel clamp quirk
    np.testing.assert_allclose(np.asarray(pg.color), expect, rtol=1e-5, atol=1e-6)


def test_red_clamp_quirk():
    """Only the red channel is clamped at zero (preprocess.comp:102-104)."""
    params, cam, _ = _setup(n=100, sh_degree=0)
    sh = np.zeros((100, 16, 3), np.float32)
    sh[:, 0, :] = -10.0  # strongly negative DC -> color < 0 pre-clamp
    import dataclasses

    params = dataclasses.replace(params, sh=np.asarray(sh))
    cfg_red = RenderConfig(sh_degree=0, color_clamp="red")
    cfg_all = RenderConfig(sh_degree=0, color_clamp="all")
    c_red = np.asarray(preprocess(params, cam, cfg_red).color)
    c_all = np.asarray(preprocess(params, cam, cfg_all).color)
    assert (c_red[:, 0] == 0.0).all() and (c_red[:, 1] < 0.0).all()
    assert (c_all == 0.0).all()
