"""Synthetic random scenes (the analogue of ``GSScene::loadTestScene``,
``src/GSScene.cpp:70-97``, generalized to N Gaussians and sane scales).

Used by tests and by the BASELINE.json config-1 fixture (10k Gaussians,
256x256, SH degree 0).
"""

from __future__ import annotations

import numpy as np

from tpusplat.types import GaussianParams


def random_scene(
    n: int,
    seed: int = 0,
    extent: float = 3.0,
    sh_degree: int = 3,
    scale_range: tuple[float, float] = (0.01, 0.15),
    opacity_range: tuple[float, float] = (0.1, 0.95),
) -> GaussianParams:
    """Random Gaussians uniform in a cube of half-side ``extent``.

    Raw parameters are produced by inverse activations so that the activated
    values land in the given ranges (log for scales, logit for opacity).
    """
    rng = np.random.default_rng(seed)
    means = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    scales = rng.uniform(*scale_range, (n, 3)).astype(np.float32)
    log_scales = np.log(scales)
    quats = rng.normal(0.0, 1.0, (n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    op = rng.uniform(*opacity_range, n).astype(np.float32)
    opacities = np.log(op / (1.0 - op))  # logit
    sh = np.zeros((n, 16, 3), np.float32)
    ncoeff = (sh_degree + 1) ** 2
    sh[:, 0, :] = rng.uniform(-1.0, 1.5, (n, 3))
    if ncoeff > 1:
        sh[:, 1:ncoeff, :] = rng.uniform(-0.3, 0.3, (n, ncoeff - 1, 3))
    return GaussianParams.create(
        means=means, log_scales=log_scales, quats=quats, opacities=opacities, sh=sh
    )
