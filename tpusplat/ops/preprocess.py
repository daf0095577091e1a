"""Per-Gaussian preprocessing: 3D covariance, EWA projection, SH color.

A single fused, fully-vectorized pass over all N Gaussians — the TPU-native
equivalent of the reference's K1 (``precomp_cov3d.comp:31-47``) and K2
(``preprocess.comp:113-181``) kernels. The reference splits them because K1
runs once at load; with training, scale/rotation change every step, so the
fusion is both simpler and faster (one HBM pass). All math is elementwise
float32 on the VPU — no batched 3x3 matmuls, so nothing is silently routed
through bf16 MXU passes.

Parity-critical constants (SURVEY.md §7 "gotchas"):
  * view-space cull at z <= 0.2 (``preprocess.comp:135``)
  * Jacobian clamp at 1.3*tan_fov (``preprocess.comp:35-40``)
  * +0.3 dilation on the 2D covariance diagonal (``preprocess.comp:63-64``)
  * det <= 0 cull (``preprocess.comp:141``)
  * eigenvalue floor max(0.1, ...) and radius ceil(3 sqrt(lambda_max))
    (``preprocess.comp:148-152``)
  * ndc2Pix(v, S) = ((v+1)*S - 1)/2 (``preprocess.comp:110-113``)
  * SH adds +0.5 and clamps only the red channel (``preprocess.comp:102-104``)
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from tpusplat.config import RenderConfig, SH_C0, SH_C1, SH_C2, SH_C3
from tpusplat.ops.activations import activate_opacity, activate_scales, normalize_quat
from tpusplat.types import Camera, GaussianParams


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ProcessedGaussians:
    """Per-Gaussian screen-space attributes — the analogue of the reference's
    ``VertexAttribute`` buffer (``common.glsl:42-49``) plus the tile-overlap
    counts (``preprocess.comp:179``).

    All arrays have leading dim N. Culled Gaussians have ntiles == 0 (the
    reference signals this via color_radii.w == 0, ``preprocess.comp:127``).
    """

    uv: jax.Array  # [N, 2] pixel-center coordinates
    conic: jax.Array  # [N, 3] inverse 2D covariance (a, b, c)
    opacity: jax.Array  # [N]
    color: jax.Array  # [N, 3]
    depth: jax.Array  # [N] view-space z
    aabb: jax.Array  # [N, 4] int32 tile box (x0, y0, x1, y1), x1/y1 exclusive
    ntiles: jax.Array  # [N] int32 overlapped-tile count (0 = culled)
    radius: jax.Array  # [N] pixel radius (0 = culled), float


def quat_to_rotmat_cols(q: jax.Array) -> tuple[jax.Array, ...]:
    """Rows of the standard rotation matrix for (w,x,y,z) quaternions.

    Returns 9 arrays r00..r22 of shape [N]. Matches ``common.glsl:50-74``
    (which stores the transpose but is consumed transposed again).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return (
        1 - 2 * (y * y + z * z),
        2 * (x * y - z * w),
        2 * (x * z + y * w),
        2 * (x * y + z * w),
        1 - 2 * (x * x + z * z),
        2 * (y * z - x * w),
        2 * (x * z - y * w),
        2 * (y * z + x * w),
        1 - 2 * (x * x + y * y),
    )


def compute_cov3d(log_scales: jax.Array, quats: jax.Array, modifier: float = 1.0):
    """Sigma_3D = R S^2 R^T, upper-triangular 6-vector (xx, xy, xz, yy, yz, zz).

    Equivalent to K1 (``precomp_cov3d.comp:31-47``: M = S*R_glsl, cov = M^T M
    with R_glsl the transposed storage of the standard R).
    """
    s = activate_scales(log_scales, modifier)
    q = normalize_quat(quats)
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = quat_to_rotmat_cols(q)
    s0, s1, s2 = s[..., 0] ** 2, s[..., 1] ** 2, s[..., 2] ** 2
    # cov[i][j] = sum_k R[i][k] * s_k^2 * R[j][k]
    xx = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    xy = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    xz = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    yy = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    yz = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    zz = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    return xx, xy, xz, yy, yz, zz


def _sh_basis(x, y, z, degree: int):
    """Real SH basis values for up to degree 3, reference constant set
    (``common.glsl:16-33``, evaluation order ``preprocess.comp:80-100``)."""
    basis = [jnp.full_like(x, SH_C0)]
    if degree >= 1:
        basis += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        basis += [
            SH_C2[0] * x * y,
            SH_C2[1] * y * z,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * z * x,
            SH_C2[4] * (xx - yy),
        ]
    if degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        basis += [
            SH_C3[0] * (3.0 * xx - yy) * y,
            SH_C3[1] * x * y * z,
            SH_C3[2] * (4.0 * zz - xx - yy) * y,
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * (xx - yy) * z,
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(basis, axis=-1)  # [N, ncoeff]


def eval_sh(means: jax.Array, sh: jax.Array, cam_pos: jax.Array, degree: int, clamp: str):
    """View-dependent color from SH (``preprocess.comp:72-108``)."""
    d = means - cam_pos
    d = d * jax.lax.rsqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    basis = _sh_basis(d[..., 0], d[..., 1], d[..., 2], degree)  # [N, K]
    k = basis.shape[-1]
    c = jnp.sum(basis[..., None] * sh[..., :k, :], axis=-2) + 0.5
    if clamp == "red":
        # Reference quirk: only c.x clamped (preprocess.comp:102-104).
        c = c.at[..., 0].max(0.0)
    elif clamp == "all":
        c = jnp.maximum(c, 0.0)
    return c


def preprocess(params: GaussianParams, camera: Camera, cfg: RenderConfig) -> ProcessedGaussians:
    """Project all Gaussians for one camera. Fully differentiable."""
    f32 = jnp.float32
    means = params.means.astype(f32)
    n = means.shape[0]

    view = camera.view
    proj = camera.proj
    w_img, h_img = camera.width, camera.height
    tiles_x, tiles_y = cfg.tile_grid(w_img, h_img)

    # --- view/clip transforms (preprocess.comp:129-137) ---
    mx, my, mz = means[:, 0], means[:, 1], means[:, 2]
    p_view = jnp.stack(
        [view[r, 0] * mx + view[r, 1] * my + view[r, 2] * mz + view[r, 3] for r in range(3)],
        axis=-1,
    )
    depth = p_view[:, 2]
    visible = depth > cfg.z_near_cull

    p_hom_w = proj[3, 0] * mx + proj[3, 1] * my + proj[3, 2] * mz + proj[3, 3]
    # The reference divides without an epsilon (preprocess.comp:131) and then
    # culls; we guard so culled lanes stay finite (NaN-safe gradients).
    # Mathematically p_hom_w == depth, so the guard never fires for visible.
    p_w = 1.0 / jnp.where(visible, p_hom_w, 1.0)
    ndc_x = (proj[0, 0] * mx + proj[0, 1] * my + proj[0, 2] * mz + proj[0, 3]) * p_w
    ndc_y = (proj[1, 0] * mx + proj[1, 1] * my + proj[1, 2] * mz + proj[1, 3]) * p_w

    # Guard the depth used in divisions so culled Gaussians don't produce
    # inf/nan that would poison gradients through jnp.where.
    tz = jnp.where(visible, depth, 1.0)
    tx, ty = p_view[:, 0], p_view[:, 1]

    # --- EWA 2D covariance (preprocess.comp:34-66) ---
    limx = 1.3 * camera.tan_fovx
    limy = 1.3 * camera.tan_fovy
    txc = jnp.clip(tx / tz, -limx, limx) * tz
    tyc = jnp.clip(ty / tz, -limy, limy) * tz
    focal_x = w_img / (2.0 * camera.tan_fovx)
    focal_y = h_img / (2.0 * camera.tan_fovy)

    # J = d(pixel)/d(view): 2x3 rows [fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    j00 = focal_x * inv_z
    j02 = -focal_x * txc * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * tyc * inv_z2

    # M = J @ V3 (2x3), V3 = upper-left of the (flipped) view matrix.
    v = view
    m00 = j00 * v[0, 0] + j02 * v[2, 0]
    m01 = j00 * v[0, 1] + j02 * v[2, 1]
    m02 = j00 * v[0, 2] + j02 * v[2, 2]
    m10 = j11 * v[1, 0] + j12 * v[2, 0]
    m11 = j11 * v[1, 1] + j12 * v[2, 1]
    m12 = j11 * v[1, 2] + j12 * v[2, 2]

    xx, xy, xz, yy, yz, zz = compute_cov3d(
        params.log_scales.astype(f32), params.quats.astype(f32), cfg.scale_modifier
    )

    # cov2d = M Sigma M^T + dilation * I    (elementwise quadratic forms)
    sm0x = xx * m00 + xy * m01 + xz * m02  # (Sigma M^T) column for row0
    sm0y = xy * m00 + yy * m01 + yz * m02
    sm0z = xz * m00 + yz * m01 + zz * m02
    sm1x = xx * m10 + xy * m11 + xz * m12
    sm1y = xy * m10 + yy * m11 + yz * m12
    sm1z = xz * m10 + yz * m11 + zz * m12
    c_a = m00 * sm0x + m01 * sm0y + m02 * sm0z + cfg.dilation
    c_b = m10 * sm0x + m11 * sm0y + m12 * sm0z
    c_c = m10 * sm1x + m11 * sm1y + m12 * sm1z + cfg.dilation

    det = c_a * c_c - c_b * c_b
    visible = visible & (det > 0.0)
    det_safe = jnp.where(det > 0.0, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c_c * inv_det, -c_b * inv_det, c_a * inv_det], axis=-1)

    # --- radius from max eigenvalue (preprocess.comp:148-152) ---
    mid = 0.5 * (c_a + c_c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lam = mid + disc  # lambda1 >= lambda2 always (disc >= 0)
    opacity = activate_opacity(params.opacities.astype(f32))
    ref_radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam, 0.0)))
    if cfg.tight_radius:
        # Opacity-aware extent: alpha = opacity * exp(-q/2) with
        # q >= |d|^2 / lam, so every pixel farther than
        # sqrt(lam * 2*ln(255*opacity)) has alpha < 1/255 and is skipped by
        # the blend cutoff (render.comp:77-79). Shrinking the AABB to that
        # radius changes neither the rendered image nor any gradient — only
        # the tile lists. Details that make this exact:
        #   * +2 margin: the exclusive AABB edge x1 = floor((uv+r+15)/16)
        #     only guarantees excluded pixels are at distance >= r-1, and
        #     the cutoff needs strict inequality — +2 covers both.
        #   * capped at the reference 3-sigma radius: a LARGER box would
        #     admit contributions the reference's AABB excludes.
        #   * opacity < 1/255 can never pass the cutoff anywhere -> cull.
        mult2 = 2.0 * jnp.log(jnp.maximum(255.0 * opacity, 1e-12))
        r_tight = jnp.ceil(
            jnp.sqrt(jnp.maximum(lam, 0.0) * jnp.maximum(mult2, 0.0))
        ) + 2.0
        radius = jnp.where(
            255.0 * opacity < 1.0, 0.0, jnp.minimum(ref_radius, r_tight)
        )
    else:
        radius = ref_radius

    # --- pixel center and tile AABB (preprocess.comp:155-165) ---
    uv_x = ((ndc_x + 1.0) * w_img - 1.0) * 0.5
    uv_y = ((ndc_y + 1.0) * h_img - 1.0) * 0.5
    uv = jnp.stack([uv_x, uv_y], axis=-1)

    # int() truncation and floor agree after the clamp to [0, tiles]
    # (negative pre-clamp values clamp to 0 either way).
    x0 = jnp.clip(jnp.floor((uv_x - radius) / cfg.tile_w), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((uv_y - radius) / cfg.tile_h), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(
        jnp.floor((uv_x + radius + cfg.tile_w - 1) / cfg.tile_w), 0, tiles_x
    ).astype(jnp.int32)
    y1 = jnp.clip(
        jnp.floor((uv_y + radius + cfg.tile_h - 1) / cfg.tile_h), 0, tiles_y
    ).astype(jnp.int32)
    ntiles = jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)

    alive = params.alive if params.alive is not None else jnp.ones((n,), bool)
    # radius == 0 marks an invisible Gaussian (the reference signals this
    # via color_radii.w == 0, preprocess.comp:127); reachable only with
    # tight_radius (the eigenvalue floor keeps the 3-sigma radius >= 2).
    visible = visible & alive & (ntiles > 0) & (radius > 0)
    ntiles = jnp.where(visible, ntiles, 0).astype(jnp.int32)
    radius = jnp.where(visible, radius, 0.0)

    color = eval_sh(means, params.sh.astype(f32), camera.cam_pos, cfg.sh_degree, cfg.color_clamp)

    return ProcessedGaussians(
        uv=uv,
        conic=conic,
        opacity=opacity,
        color=color,
        depth=depth,
        aabb=jnp.stack([x0, y0, x1, y1], axis=-1),
        ntiles=ntiles,
        radius=radius,
    )
