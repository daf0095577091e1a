"""Runtime validation: the TPU-native analogue of the reference's two
sanitizer layers — Vulkan validation layers with a logging callback
(``src/vulkan/VulkanContext.cpp:11-35``) and in-shader ``assert`` /
``MAGIC`` sentinels (``src/shaders/common.glsl:5-14``,
``preprocess.comp:181``).

XLA's dataflow ordering makes races impossible, so what remains worth
guarding at runtime is *numerical and invariant* corruption: NaN/Inf in the
per-Gaussian attributes (silently poisons training), and violations of the
tile-range invariants the rasterizer trusts blindly (start <= end <=
capacity, sorted tile ids, payload ids in range). All checks are in-graph
int32 violation counters (device scalars, ~zero cost next to the render);
the host raises via :func:`raise_on_violations`.

Enabled by ``RenderConfig(debug_checks=True)`` — off by default, exactly
like the reference's ``--validation`` flag (``apps/viewer/main.cpp:14-16``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpusplat.ops.binning import BinnedInstances
from tpusplat.ops.preprocess import ProcessedGaussians


def _count_nonfinite(x) -> jax.Array:
    return jnp.sum(~jnp.isfinite(x)).astype(jnp.int32)


def check_processed(pg: ProcessedGaussians) -> dict[str, jax.Array]:
    """Finite-value checks on every preprocess output (all lanes: culled
    lanes are guarded to stay finite by construction — a NaN anywhere means
    corrupted parameters or a broken guard)."""
    return {
        "nonfinite_uv": _count_nonfinite(pg.uv),
        "nonfinite_conic": _count_nonfinite(pg.conic),
        "nonfinite_opacity": _count_nonfinite(pg.opacity),
        "nonfinite_color": _count_nonfinite(pg.color),
        "nonfinite_depth": _count_nonfinite(pg.depth),
        # A visible Gaussian must have a positive-definite conic: a >= 0,
        # c >= 0 (diagonal of an inverse covariance with +dilation).
        "bad_conic_sign": jnp.sum(
            (pg.ntiles > 0)
            & ((pg.conic[:, 0] < 0.0) | (pg.conic[:, 2] < 0.0))
        ).astype(jnp.int32),
        # aabb must be a valid sub-box of the tile grid for visible lanes.
        "bad_aabb": jnp.sum(
            (pg.ntiles > 0)
            & (
                (pg.aabb[:, 0] > pg.aabb[:, 2])
                | (pg.aabb[:, 1] > pg.aabb[:, 3])
                | (pg.aabb[:, 0] < 0)
                | (pg.aabb[:, 1] < 0)
            )
        ).astype(jnp.int32),
    }


def check_binned(binned: BinnedInstances, num_gaussians: int) -> dict[str, jax.Array]:
    """Invariants the rasterizer trusts: monotone sorted tile ids, ranges
    with 0 <= start <= end <= capacity, and end[t] == start[t+1] coverage
    (the reference's empty-tile start == end convention,
    ``tile_boundary.comp:22-50``)."""
    capacity = binned.tile_id.shape[0]
    tid = binned.tile_id
    starts, ends = binned.tile_start, binned.tile_end
    return {
        "unsorted_tile_id": jnp.sum(tid[1:] < tid[:-1]).astype(jnp.int32),
        "gid_out_of_range": jnp.sum(
            (binned.gauss_id < 0) | (binned.gauss_id > num_gaussians)
        ).astype(jnp.int32),
        "bad_tile_range": jnp.sum(
            (starts > ends) | (starts < 0) | (ends > capacity)
        ).astype(jnp.int32),
        "range_gap": jnp.sum(starts[1:] != ends[:-1]).astype(jnp.int32),
        "negative_overflow": jnp.maximum(-binned.overflow, 0).astype(jnp.int32),
    }


def check_image(img: jax.Array) -> dict[str, jax.Array]:
    return {"nonfinite_pixels": _count_nonfinite(img)}


def raise_on_violations(aux: dict) -> None:
    """Host-side trap: raise if any debug counter is nonzero. The analogue of
    the reference's validation-layer logging callback aborting the run."""
    checks = aux.get("debug")
    if checks is None:
        return
    bad = {k: int(v) for k, v in checks.items() if int(v) != 0}
    if bad:
        raise RuntimeError(f"tpusplat validation failed: {bad}")
