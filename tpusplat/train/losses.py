"""Training losses: L1 + D-SSIM, the original 3DGS objective.

The reference is a forward-only viewer with no loss functions; these follow
the standard 3DGS training formulation (loss = (1-lambda) L1 + lambda (1 -
SSIM), lambda = 0.2) so scenes trained here are drop-in loadable by the
reference viewer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l1_loss(img: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(img - target))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim_map(img: jax.Array, target: jax.Array, size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Per-pixel SSIM map for [B, H, W, C] pairs (SAME zero padding).

    Standard constants C1 = 0.01^2, C2 = 0.03^2 for [0, 1] range; 11x11
    Gaussian window, matching the original 3DGS training code's settings.
    Exposed separately so the tile-sharded strip loss can compute exact
    per-row contributions with halo exchange (parallel/sharded.py).
    """
    win = _gaussian_window(size, sigma)[:, :, None, None]  # [k, k, 1, 1]
    c = img.shape[-1]
    kernel = jnp.tile(win, (1, 1, 1, c))  # depthwise

    def filt(x):
        # NHWC, depthwise conv, same padding
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu_x = filt(img)
    mu_y = filt(target)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x = filt(img * img) - mu_x2
    sigma_y = filt(target * target) - mu_y2
    sigma_xy = filt(img * target) - mu_xy

    c1, c2 = 0.01**2, 0.03**2
    num = (2 * mu_xy + c1) * (2 * sigma_xy + c2)
    den = (mu_x2 + mu_y2 + c1) * (sigma_x + sigma_y + c2)
    return num / den


def ssim(img: jax.Array, target: jax.Array, size: int = 11,
         sigma: float = 1.5, crop_border: bool = False) -> jax.Array:
    """Mean SSIM over an [H, W, C] (or [B, H, W, C]) image pair.

    ``crop_border``: exclude the size//2-wide frame where SAME zero
    padding biases the local statistics (variance estimates go negative,
    and near-perfect reconstructions can read > 1). The training loss
    keeps the full map for parity with the original 3DGS objective;
    REPORTED eval metrics crop, so eval SSIM is a proper [-1, 1] score.
    """
    if img.ndim == 3:
        img = img[None]
        target = target[None]
    smap = ssim_map(img, target, size, sigma)
    if crop_border:
        hb = size // 2
        smap = smap[:, hb:-hb, hb:-hb]
    return jnp.mean(smap)


def psnr(img: jax.Array, target: jax.Array) -> jax.Array:
    """Peak signal-to-noise ratio in dB for [0, 1]-range images.

    The held-out image-quality metric (the number that proves training
    produced a scene worth viewing — the reference's whole input contract
    is a well-trained .ply, ``src/GSScene.cpp:26-68``). A loss delta can
    improve while render quality regresses (opacity collapse,
    over-densification); PSNR on held-out views cannot.
    """
    mse = jnp.mean((img - target) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def gs_loss(img: jax.Array, target: jax.Array, ssim_weight: float = 0.2) -> jax.Array:
    """(1 - w) * L1 + w * (1 - SSIM), the 3DGS photometric objective."""
    return (1.0 - ssim_weight) * l1_loss(img, target) + ssim_weight * (
        1.0 - ssim(img, target)
    )
