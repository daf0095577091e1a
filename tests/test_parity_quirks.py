"""Targeted tests for the reference's parity gotchas (SURVEY.md §7):
covariance dilation, eigenvalue floor, Jacobian clamp, alpha clamp,
near-plane cull, blend cutoffs and termination."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from tpusplat.camera import look_at_camera, make_camera
from tpusplat.config import RenderConfig
from tpusplat.ops.preprocess import preprocess
from tpusplat.render import render_stages
from tpusplat.types import GaussianParams


def _one_gaussian(pos, scale=0.1, opacity_raw=4.0, dc=(1.0, 1.0, 1.0)):
    sh = np.zeros((1, 16, 3), np.float32)
    from tpusplat.config import SH_C0

    sh[0, 0] = (np.asarray(dc) - 0.5) / SH_C0
    return GaussianParams.create(
        means=np.asarray([pos], np.float32),
        log_scales=np.log(np.full((1, 3), scale, np.float32)),
        quats=np.asarray([[1, 0, 0, 0]], np.float32),
        opacities=np.asarray([opacity_raw], np.float32),
        sh=sh,
    )


CAM = look_at_camera([0, 0, 5.0], [0, 0, 0], 64, 64, fov_deg=60.0)
CFG = RenderConfig(sh_degree=0, max_per_tile=64, tile_chunk=4)


def test_covariance_dilation_floor():
    """A tiny Gaussian's 2D covariance is dominated by the +0.3 dilation
    (preprocess.comp:63-64): conic ~ 1/0.3 on the diagonal."""
    params = _one_gaussian([0, 0, 0], scale=1e-4)
    pg = preprocess(params, CAM, CFG)
    conic = np.asarray(pg.conic)[0]
    np.testing.assert_allclose(conic[0], 1 / 0.3, rtol=1e-3)
    np.testing.assert_allclose(conic[2], 1 / 0.3, rtol=1e-3)
    # Eigenvalue floor max(0.1, ...) keeps the radius strictly positive:
    # lambda_max >= mid + sqrt(0.1).
    assert float(pg.radius[0]) >= np.ceil(3 * np.sqrt(0.3))


def test_radius_eigenvalue_floor_exact():
    """For an isotropic splat, lambda = sigma2d + sqrt(max(0.1, 0)) is
    affected by the 0.1 floor whenever the discriminant is tiny."""
    params = _one_gaussian([0, 0, 0], scale=0.05)
    pg = preprocess(params, CAM, CFG)
    # isotropic: cov2d = (s*f/z)^2 + 0.3 on both diagonal entries, b=0
    f = 64 / (2 * float(CAM.tan_fovx))
    sigma = (0.05 * f / 5.0) ** 2 + 0.3
    lam = sigma + np.sqrt(0.1)  # disc = max(0.1, mid^2-det) = 0.1 exactly
    np.testing.assert_allclose(float(pg.radius[0]), np.ceil(3 * np.sqrt(lam)))


def test_near_plane_cull_boundary():
    """Cull at p_view.z <= 0.2 regardless of configured near plane
    (preprocess.comp:135)."""
    # camera at z=5 looking at origin: depth of a point at z=p is 5-p.
    for z, visible in ((4.81, False), (4.75, True)):
        params = _one_gaussian([0, 0, z], scale=0.05)
        pg = preprocess(params, CAM, CFG)
        assert (int(pg.ntiles[0]) > 0) == visible, z


def test_jacobian_clamp_at_frustum_edge():
    """txtz clamps at 1.3*tan_fov (preprocess.comp:35-40): a Gaussian far
    outside the frustum cone gets the same Jacobian as one at the clamp."""
    t = float(CAM.tan_fovx)
    depth = 5.0 - 1.0  # gaussian at z=1 -> depth 4
    params_edge = _one_gaussian([1.3 * t * depth, 0, 1.0], scale=0.05)
    params_out = _one_gaussian([2.5 * t * depth, 0, 1.0], scale=0.05)
    pg_e = preprocess(params_edge, CAM, CFG)
    pg_o = preprocess(params_out, CAM, CFG)
    # Same clamped Jacobian -> same 2D covariance determinant (conic scale),
    # even though uv differs.
    ce, co = np.asarray(pg_e.conic)[0], np.asarray(pg_o.conic)[0]
    np.testing.assert_allclose(ce[0] * ce[2] - ce[1] ** 2,
                               co[0] * co[2] - co[1] ** 2, rtol=1e-4)


def test_alpha_clamp_099():
    """alpha = min(0.99, ...) (render.comp:77): a fully opaque Gaussian
    contributes exactly 0.99, never 1.0, and leaves T = 0.01."""
    params = _one_gaussian([0, 0, 1.0], opacity_raw=20.0, dc=(1, 0, 0))
    params = dataclasses.replace(
        params, log_scales=jnp.full((1, 3), jnp.log(5.0), jnp.float32)
    )
    img, aux = render_stages(params, CAM, CFG)
    center = np.asarray(img)[32, 32]
    np.testing.assert_allclose(center[0], 0.99, atol=1e-4)
    np.testing.assert_allclose(
        float(np.asarray(aux["transmittance"])[32, 32]), 0.01, rtol=1e-4
    )


def test_termination_before_add():
    """The Gaussian that would push T below 1e-4 is NOT blended
    (render.comp:81-88 breaks before accumulating)."""
    # Four stacked alpha=0.95 gaussians: T walks 0.05, 2.5e-3, 1.25e-4
    # (all >= 1e-4, so the first three contribute), then 6.25e-6 — the
    # fourth is cut off before contributing.
    logit = float(np.log(0.95 / 0.05))
    colors = [(1, 0, 0), (0, 1, 0), (0, 0, 0.5), (0, 0, 1)]
    gs = [
        _one_gaussian([0, 0, 1.0 - 0.5 * i], opacity_raw=logit, dc=c)
        for i, c in enumerate(colors)
    ]
    params = GaussianParams.create(
        means=np.concatenate([g.means for g in gs]),
        log_scales=np.full((4, 3), np.log(5.0), np.float32),
        quats=np.concatenate([g.quats for g in gs]),
        opacities=np.concatenate([g.opacities for g in gs]),
        sh=np.concatenate([g.sh for g in gs]),
    )
    img, aux = render_stages(params, CAM, CFG)
    center = np.asarray(img)[32, 32]
    np.testing.assert_allclose(center[0], 0.95, atol=1e-4)
    np.testing.assert_allclose(center[1], 0.95 * 0.05, rtol=1e-3)
    # third contributes (T = 1.25e-4 >= 1e-4); fourth does not.
    np.testing.assert_allclose(center[2], 0.5 * 0.95 * 0.0025, rtol=1e-2)
    # Our aux T is the full product over passing Gaussians (the reference
    # freezes T at the break but never outputs it, so this is our own,
    # consistently-defined channel).
    np.testing.assert_allclose(
        float(np.asarray(aux["transmittance"])[32, 32]), 0.05**4, rtol=1e-2
    )


def test_min_alpha_cutoff():
    """Contributions below 1/255 are skipped entirely (render.comp:78-80)."""
    params = _one_gaussian([0, 0, 0], opacity_raw=np.log(1 / 255.0 * 0.999 /
                                                         (1 - 1 / 255.0 * 0.999)))
    img, _ = render_stages(params, CAM, CFG)
    assert np.asarray(img).max() == 0.0


def test_reference_camera_pose_matches_viewer_defaults():
    """make_camera with the viewer defaults (fov 45, near 0.2, far 1000)
    projects like the reference's updateUniforms."""
    cam = make_camera([0, 0, 0], [1, 0, 0, 0], 1280, 720)
    assert np.isclose(float(cam.tan_fovx), np.tan(np.radians(45.0) / 2))
    assert np.isclose(float(cam.tan_fovy), float(cam.tan_fovx) * 720 / 1280)
