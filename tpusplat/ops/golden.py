"""Golden oracle renderer: literal, sequential numpy implementation.

An independent, deliberately-naive re-implementation of the reference's
forward semantics (K1, K2, K4 ordering, K8 blending) used as the in-repo
correctness oracle (SURVEY.md §4: the reference ships no tests, so the
verification story is ours). Per tile it sorts the overlapping Gaussians by
(depth, emission order) and walks pixels front-to-back with the exact
sequential break logic of ``render.comp:61-89``. O(N * pixels) and
host-side — use only on small configs.
"""

from __future__ import annotations

import numpy as np

from tpusplat.config import RenderConfig
from tpusplat.types import Camera, GaussianParams


def golden_preprocess(params: GaussianParams, camera: Camera, cfg: RenderConfig):
    """Sequential numpy version of preprocess (per-Gaussian loop, f32)."""
    n = params.means.shape[0]
    means = np.asarray(params.means, np.float32)
    log_scales = np.asarray(params.log_scales, np.float32)
    quats = np.asarray(params.quats, np.float32)
    opac_raw = np.asarray(params.opacities, np.float32)
    sh = np.asarray(params.sh, np.float32)
    alive = np.asarray(params.alive, bool)

    view = np.asarray(camera.view, np.float32)
    proj = np.asarray(camera.proj, np.float32)
    cam_pos = np.asarray(camera.cam_pos, np.float32)
    w_img, h_img = camera.width, camera.height
    tan_fovx = float(camera.tan_fovx)
    tan_fovy = float(camera.tan_fovy)
    tiles_x, tiles_y = cfg.tile_grid(w_img, h_img)

    out = dict(
        uv=np.zeros((n, 2), np.float32),
        conic=np.zeros((n, 3), np.float32),
        opacity=np.zeros((n,), np.float32),
        color=np.zeros((n, 3), np.float32),
        depth=np.zeros((n,), np.float32),
        aabb=np.zeros((n, 4), np.int32),
        ntiles=np.zeros((n,), np.int32),
        radius=np.zeros((n,), np.float32),
    )

    focal_x = w_img / (2.0 * tan_fovx)
    focal_y = h_img / (2.0 * tan_fovy)

    from tpusplat.config import SH_C0, SH_C1, SH_C2, SH_C3

    for i in range(n):
        if not alive[i]:
            continue
        pos = np.append(means[i], 1.0).astype(np.float32)
        p_view = view @ pos
        depth = p_view[2]
        if depth <= cfg.z_near_cull:
            continue
        p_hom = proj @ pos
        ndc = p_hom[:3] / p_hom[3]

        # cov3d = R S^2 R^T
        q = quats[i] / np.linalg.norm(quats[i])
        w, x, y, z = q
        r_mat = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
            ],
            np.float32,
        )
        s_diag = np.exp(log_scales[i]) * cfg.scale_modifier
        sigma = r_mat @ np.diag(s_diag**2) @ r_mat.T

        # EWA projection
        tx, ty, tz = p_view[:3]
        limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
        txc = min(limx, max(-limx, tx / tz)) * tz
        tyc = min(limy, max(-limy, ty / tz)) * tz
        j_mat = np.array(
            [
                [focal_x / tz, 0, -(focal_x * txc) / (tz * tz)],
                [0, focal_y / tz, -(focal_y * tyc) / (tz * tz)],
            ],
            np.float32,
        )
        m_mat = j_mat @ view[:3, :3]
        cov2d = m_mat @ sigma @ m_mat.T
        cov2d[0, 0] += cfg.dilation
        cov2d[1, 1] += cfg.dilation
        det = cov2d[0, 0] * cov2d[1, 1] - cov2d[0, 1] * cov2d[1, 0]
        if det <= 0:
            continue
        conic = np.array(
            [cov2d[1, 1] / det, -cov2d[0, 1] / det, cov2d[0, 0] / det], np.float32
        )

        mid = 0.5 * (cov2d[0, 0] + cov2d[1, 1])
        lam = mid + np.sqrt(max(0.1, mid * mid - det))
        radius = np.ceil(3.0 * np.sqrt(lam))

        uv = np.array(
            [((ndc[0] + 1.0) * w_img - 1.0) * 0.5, ((ndc[1] + 1.0) * h_img - 1.0) * 0.5],
            np.float32,
        )
        x0 = int(np.clip(int((uv[0] - radius) / cfg.tile_w), 0, tiles_x))
        y0 = int(np.clip(int((uv[1] - radius) / cfg.tile_h), 0, tiles_y))
        x1 = int(np.clip(int((uv[0] + radius + cfg.tile_w - 1) / cfg.tile_w), 0, tiles_x))
        y1 = int(np.clip(int((uv[1] + radius + cfg.tile_h - 1) / cfg.tile_h), 0, tiles_y))
        ntiles = max(x1 - x0, 0) * max(y1 - y0, 0)
        if ntiles == 0:
            continue

        # SH color
        d = means[i] - cam_pos
        d = d / np.linalg.norm(d)
        dx, dy, dz = d
        c = SH_C0 * sh[i, 0]
        if cfg.sh_degree >= 1:
            c = c - SH_C1 * sh[i, 1] * dy + SH_C1 * sh[i, 2] * dz - SH_C1 * sh[i, 3] * dx
        if cfg.sh_degree >= 2:
            xx, yy, zz = dx * dx, dy * dy, dz * dz
            c = (
                c
                + SH_C2[0] * sh[i, 4] * dx * dy
                + SH_C2[1] * sh[i, 5] * dy * dz
                + SH_C2[2] * sh[i, 6] * (2 * zz - xx - yy)
                + SH_C2[3] * sh[i, 7] * dz * dx
                + SH_C2[4] * sh[i, 8] * (xx - yy)
            )
        if cfg.sh_degree >= 3:
            xx, yy, zz = dx * dx, dy * dy, dz * dz
            c = (
                c
                + SH_C3[0] * sh[i, 9] * (3 * xx - yy) * dy
                + SH_C3[1] * sh[i, 10] * dx * dy * dz
                + SH_C3[2] * sh[i, 11] * (4 * zz - xx - yy) * dy
                + SH_C3[3] * sh[i, 12] * dz * (2 * zz - 3 * xx - 3 * yy)
                + SH_C3[4] * sh[i, 13] * dx * (4 * zz - xx - yy)
                + SH_C3[5] * sh[i, 14] * (xx - yy) * dz
                + SH_C3[6] * sh[i, 15] * dx * (xx - 3 * yy)
            )
        c = c + 0.5
        if cfg.color_clamp == "red":
            c[0] = max(c[0], 0.0)
        elif cfg.color_clamp == "all":
            c = np.maximum(c, 0.0)

        out["uv"][i] = uv
        out["conic"][i] = conic
        out["opacity"][i] = 1.0 / (1.0 + np.exp(-opac_raw[i]))
        out["color"][i] = c
        out["depth"][i] = depth
        out["aabb"][i] = (x0, y0, x1, y1)
        out["ntiles"][i] = ntiles
        out["radius"][i] = radius
    return out


def golden_render(params: GaussianParams, camera: Camera, cfg: RenderConfig):
    """Full golden forward render. Returns rgb [H, W, 3] float32."""
    pre = golden_preprocess(params, camera, cfg)
    w_img, h_img = camera.width, camera.height
    tiles_x, tiles_y = cfg.tile_grid(w_img, h_img)
    img = np.zeros((h_img, w_img, 3), np.float32)

    # Emit instances in Gaussian order, x outer / y inner
    # (preprocess_sort.comp:47-48), then stable-sort by (tile, depth).
    tiles_of: list[list[tuple[float, int]]] = [[] for _ in range(tiles_x * tiles_y)]
    n = pre["ntiles"].shape[0]
    for i in range(n):
        if pre["ntiles"][i] == 0:
            continue
        x0, y0, x1, y1 = pre["aabb"][i]
        for txi in range(x0, x1):
            for tyi in range(y0, y1):
                tiles_of[txi + tyi * tiles_x].append((pre["depth"][i], i))

    for t_idx, items in enumerate(tiles_of):
        if not items:
            continue
        items.sort(key=lambda di: di[0])  # python sort is stable
        txi = t_idx % tiles_x
        tyi = t_idx // tiles_x
        for ly in range(cfg.tile_h):
            for lx in range(cfg.tile_w):
                px, py = txi * cfg.tile_w + lx, tyi * cfg.tile_h + ly
                if px >= w_img or py >= h_img:
                    continue
                t_acc = np.float32(1.0)
                c_acc = np.zeros(3, np.float32)
                for _, i in items:
                    dx = pre["uv"][i, 0] - px
                    dy = pre["uv"][i, 1] - py
                    a, b, cc = pre["conic"][i]
                    power = -0.5 * (a * dx * dx + cc * dy * dy) - b * dx * dy
                    if power > 0.0:
                        continue
                    alpha = min(cfg.alpha_max, pre["opacity"][i] * np.exp(power))
                    if alpha < cfg.alpha_min:
                        continue
                    test_t = t_acc * (1.0 - alpha)
                    if test_t < cfg.t_min:
                        break
                    c_acc = c_acc + pre["color"][i] * alpha * t_acc
                    t_acc = test_t
                img[py, px] = c_acc
    return img


def golden_render_jnp(params: GaussianParams, camera: Camera, cfg: RenderConfig):
    """Independent *differentiable* golden: naive O(N * pixels) jnp blend.

    Per pixel, blends all Gaussians (globally depth-sorted, stop-gradient
    permutation) whose tile AABB covers the pixel's tile — the same discrete
    structure as the tile pipeline, but with none of its machinery (no
    instance expansion, no per-tile sort, no chunking). Used to cross-check
    pipeline gradients; small scenes only.
    """
    import jax.numpy as jnp
    from jax import lax

    from tpusplat.ops.preprocess import preprocess

    pg = preprocess(params, camera, cfg)
    w_img, h_img = camera.width, camera.height
    tiles_x, _ = cfg.tile_grid(w_img, h_img)
    n = pg.uv.shape[0]

    order = jnp.argsort(lax.stop_gradient(jnp.where(pg.ntiles > 0, pg.depth, jnp.inf)))
    uv = pg.uv[order]
    conic = pg.conic[order]
    opacity = pg.opacity[order]
    color = pg.color[order]
    aabb = pg.aabb[order]
    live = (pg.ntiles > 0)[order]

    px = lax.broadcasted_iota(jnp.int32, (h_img, w_img), 1).reshape(-1)
    py = lax.broadcasted_iota(jnp.int32, (h_img, w_img), 0).reshape(-1)
    tx = px // cfg.tile_w
    ty = py // cfg.tile_h
    pxf = px.astype(jnp.float32)
    pyf = py.astype(jnp.float32)

    # [N, P] masks and alphas
    covers = (
        live[:, None]
        & (aabb[:, 0:1] <= tx[None, :])
        & (tx[None, :] < aabb[:, 2:3])
        & (aabb[:, 1:2] <= ty[None, :])
        & (ty[None, :] < aabb[:, 3:4])
    )
    dx = uv[:, 0:1] - pxf[None, :]
    dy = uv[:, 1:2] - pyf[None, :]
    a, b, c = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(cfg.alpha_max, opacity[:, None] * jnp.exp(power))
    ok = covers & (power <= 0.0) & (alpha >= cfg.alpha_min)
    f = jnp.where(ok, 1.0 - alpha, 1.0)
    t_incl = jnp.cumprod(f, axis=0)
    t_excl = t_incl / f
    contrib = ok & (t_incl >= cfg.t_min)
    wgt = jnp.where(contrib, alpha * t_excl, 0.0)  # [N, P]
    rgb = jnp.einsum("np,nc->pc", wgt, color, precision="highest")
    return rgb.reshape(h_img, w_img, 3)
