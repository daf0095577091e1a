"""Static render configuration.

The analogue of the reference's ``RendererConfiguration`` plus the compile-time
shader constants (``src/shaders/common.glsl:1-2`` TILE_WIDTH/TILE_HEIGHT; the
descriptor-level knobs of ``src/Renderer.h:143`` sortBufferSizeMultiplier).
Everything here is static under ``jax.jit`` — changing a field re-compiles,
exactly like the reference re-records command buffers on resize
(``src/Renderer.cpp:102-117``).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Hashable, jit-static configuration for the splatting pipeline.

    Attributes:
      tile_w, tile_h: raster tile size in pixels. 16x16 matches the reference
        (``common.glsl:1-2``) and is required for bit-parity of the tile
        binning; TPU kernels internally regroup tiles into VPU-shaped blocks.
      sh_degree: max spherical-harmonics degree evaluated (0..3). The
        reference always evaluates degree 3 (``preprocess.comp:73-108``);
        lower degrees are equivalent when the higher coefficients are zero.
      color_clamp: "red" reproduces the reference quirk of clamping only the
        red channel at zero after the +0.5 SH offset (``preprocess.comp:102-104``);
        "all" clamps every channel (the upstream-3DGS behaviour); "none"
        disables clamping.
      capacity_mult: static instance-buffer capacity as a multiple of N
        (the analogue of ``sortBufferSizeMultiplier``, ``src/Renderer.h:143``),
        used when ``capacity`` is None.
      capacity: optional explicit instance capacity (tile x gaussian pairs).
      scale_modifier: global multiplier on activated scales (the
        ``scale_factor`` push constant of ``precomp_cov3d.comp:20``; host
        passes 1.0 at ``src/GSScene.cpp:176-178``).
      z_near_cull: view-space depth cull threshold (``preprocess.comp:135``
        hardcodes 0.2 regardless of the configured near plane).
      dilation: screen-space covariance dilation added to the diagonal
        (``preprocess.comp:63-64``).
      alpha_max / alpha_min / t_min: blending constants
        (``render.comp:77-84``): alpha clamped to 0.99, contributions below
        1/255 skipped, termination when transmittance would drop below 1e-4.
      tile_chunk: number of tiles processed per XLA-rasterizer map step
        (memory knob, no effect on results).
      gauss_chunk: per-tile gaussian chunk length in the rasterizer inner
        loop (vectorization knob, no effect on results).
      max_per_tile: static cap on instances considered per tile in the XLA
        rasterizer; instances beyond the cap are dropped (overflow is
        reported by ``render_stages``). The Pallas kernel streams the true
        range and does not use this.
      use_pallas: route rasterization through the Pallas TPU kernel instead
        of the pure-XLA implementation.
      debug_checks: runtime validation mode (ops/validate.py) — in-graph
        NaN/invariant counters surfaced in aux["debug"], raised on the host
        by validate.raise_on_violations. The analogue of the reference's
        ``--validation`` layers + in-shader asserts
        (``src/vulkan/VulkanContext.cpp:11-35``, ``common.glsl:5-14``).
        Off by default (near-zero cost when on; still off for parity).
      mm_precision: MXU precision of the blend kernels' matmuls. "highest"
        (default) is f32-exact via 6-pass bf16 decomposition — required for
        reference parity. "default" is one bf16 pass (~0.4% relative input
        rounding): measured 8%/13% faster fwd/bwd at garden scale, a
        production option for training where gradient noise dominates.
      tight_radius: shrink each Gaussian's tile AABB to the opacity-aware
        radius sqrt(lam_max * 2 ln(255*opacity)) (capped at the reference's
        3 sigma, ``preprocess.comp:148-152``). Every excluded pixel is
        guaranteed to fail the alpha >= 1/255 blend cutoff
        (``render.comp:77-79``), so the rendered image and all gradients are
        bit-identical to the reference AABB — only per-Gaussian
        radius/ntiles statistics change. Off by default for strict parity
        of those statistics; turn on for production/bench (10-40% fewer
        instances depending on the opacity distribution).
    """

    tile_w: int = 16
    tile_h: int = 16
    mm_precision: str = "highest"
    sh_degree: int = 3
    color_clamp: str = "red"
    capacity_mult: float = 8
    capacity: int | None = None
    scale_modifier: float = 1.0
    z_near_cull: float = 0.2
    dilation: float = 0.3
    alpha_max: float = 0.99
    alpha_min: float = 1.0 / 255.0
    t_min: float = 1e-4
    tile_chunk: int = 64
    gauss_chunk: int = 64
    max_per_tile: int = 1024
    use_pallas: bool = False
    tight_radius: bool = False
    debug_checks: bool = False
    # Strip-compaction slack (tile-sharded rendering only): each strip's
    # Gaussian stream is compacted to the first
    # N * (nrows + strip_gauss_margin_rows)/tiles_y * strip_gauss_mult
    # depth-ordered strip-visible Gaussians, removing most of the per-chip
    # N-replication tax (docs/SCALING.md). Gaussians beyond the cap are
    # counted into the overflow channel, so a too-small cap is detected,
    # never silent — but a host regrow loop that only grows the INSTANCE
    # capacity will not clear it: if overflow persists after an instance
    # regrow, raise strip_gauss_mult (or set 0 to disable compaction).
    strip_gauss_mult: float = 2.0
    strip_gauss_margin_rows: int = 4
    # Gradient exchange for tile-sharded training (parallel/sharded.py):
    # "dense" (default) backprops the attribute all_gather, whose
    # transpose psum-scatters dense [N, ...] gradients; "compact" routes
    # them through the compact all-to-all exchange
    # (parallel/compact_grad.py) — each chip reduces only over its
    # compacted Gaussian stream and exchanges (gauss_id, grad-row)
    # buckets to the owning shards, so no chip materializes dense [N]
    # gradients. Hardware verdict (v5e, garden strip scale,
    # docs/SCALING.md): the occupancy-adaptive segment-reduce window cut
    # the dense reduce 7.2 -> 2.7 ms, after which compact's extra stages
    # (stream sort + owner-side multi-block reduce, ~3 ms irreducible)
    # make it a measured net LOSS of ~4-7 ms/strip — dense is the
    # production default; compact remains available, tested equal, and
    # may pay on comm-constrained (DCN) topologies.
    grad_exchange: str = "dense"
    # All-to-all bucket capacity per destination shard, as a multiple of
    # the even split gauss_capacity/S (rounded to 256, capped at N/S which
    # is always sufficient since ids are unique). Overflow is counted in
    # the fwd pass into the gauss/a2a overflow channel and gates the step.
    grad_a2a_mult: float = 1.3

    def __post_init__(self):
        # A typo like MM_PRECISION=Highest must not silently degrade to the
        # non-parity bf16 path — unknown values are an error, not a default.
        if self.mm_precision not in ("highest", "default"):
            raise ValueError(
                f"mm_precision must be 'highest' or 'default', got "
                f"{self.mm_precision!r}"
            )
        if self.color_clamp not in ("red", "all", "none"):
            raise ValueError(f"unknown color_clamp {self.color_clamp!r}")
        if self.grad_exchange not in ("dense", "compact"):
            raise ValueError(
                f"grad_exchange must be 'dense' or 'compact', got "
                f"{self.grad_exchange!r}"
            )

    def instance_capacity(self, num_gaussians: int) -> int:
        cap = self.capacity if self.capacity is not None else int(
            self.capacity_mult * num_gaussians
        )
        # Round up so the instance axis tiles evenly onto (8, 128) f32 lanes.
        return max(1024, -(-cap // 1024) * 1024)

    def with_env_overrides(self) -> "RenderConfig":
        """Apply TPUSPLAT_* environment overrides (the analogue of the
        reference's VKGS_ env layer, ``apps/viewer/main.cpp:46-50``:
        VKGS_VALIDATION_LAYERS / VKGS_PHYSICAL_DEVICE /
        VKGS_IMMEDIATE_SWAPCHAIN), covering the knobs that matter on TPU.

        Precedence mirrors the reference: CLI flag > env var > default —
        callers apply this to the config built from defaults, then overlay
        explicit CLI choices.
        """
        import os

        def _bool(v: str) -> bool:
            return v.strip().lower() not in ("", "0", "false", "off", "no")

        env = {
            "TPUSPLAT_USE_PALLAS": ("use_pallas", _bool),
            "TPUSPLAT_TIGHT_RADIUS": ("tight_radius", _bool),
            "TPUSPLAT_DEBUG_CHECKS": ("debug_checks", _bool),
            "TPUSPLAT_CAPACITY_MULT": ("capacity_mult", float),
            "TPUSPLAT_CAPACITY": ("capacity", int),
            "TPUSPLAT_MAX_PER_TILE": ("max_per_tile", int),
            "TPUSPLAT_SH_DEGREE": ("sh_degree", int),
            "TPUSPLAT_MM_PRECISION": ("mm_precision", str),
            # Sharded-training knobs: reachable from the product CLIs
            # (apps/train.py --mesh) without code changes, so the
            # per-channel regrow recoveries are tunable end-to-end.
            "TPUSPLAT_GRAD_EXCHANGE": ("grad_exchange", str),
            "TPUSPLAT_GRAD_A2A_MULT": ("grad_a2a_mult", float),
            "TPUSPLAT_STRIP_GAUSS_MULT": ("strip_gauss_mult", float),
        }
        updates = {}
        for var, (field, conv) in env.items():
            raw = os.environ.get(var)
            if raw is not None:
                updates[field] = conv(raw)
        return dataclasses.replace(self, **updates) if updates else self

    def strip_gauss_capacity(self, n: int, nrows: int, tiles_y: int) -> int | None:
        """Static Gaussian-stream cap for one strip of ``nrows`` tile rows
        (None = compaction off / not worthwhile)."""
        if self.strip_gauss_mult <= 0 or nrows >= tiles_y:
            return None
        frac = min(1.0, (nrows + self.strip_gauss_margin_rows) / tiles_y)
        cap = int(n * frac * self.strip_gauss_mult)
        cap = max(1024, -(-cap // 1024) * 1024)
        return cap if cap < n else None

    def tile_grid(self, width: int, height: int) -> tuple[int, int]:
        """(tiles_x, tiles_y), ceil-divided like ``preprocess.comp:127``."""
        return (
            (width + self.tile_w - 1) // self.tile_w,
            (height + self.tile_h - 1) // self.tile_h,
        )


def regrow(cfg: RenderConfig, counters: dict, shard_gaussians: int):
    """One shared overflow-recovery policy for every driver loop.

    ``counters``: the overflow dict a render/train step returns (values may
    be device scalars or per-device arrays — summed here). Each channel
    names its own recovery (the reference has one knob, the sort-buffer
    multiplier, ``src/Renderer.h:143``; we have four because the sharded
    pipeline has four static capacities):

      capacity_overflow -> instance capacity (based on the PER-SHARD
        Gaussian count — ``shard_gaussians`` — since render_sharded sizes
        its buffers per tile shard)
      gauss_overflow    -> strip_gauss_mult (compacted-stream cap)
      a2a_overflow      -> grad_a2a_mult (compact-exchange bucket cap)
      tile_overflow     -> max_per_tile (XLA-rasterizer per-tile cap)

    Returns (new_cfg, log_dict) — log_dict is None when nothing overflowed
    (new_cfg is then ``cfg`` itself).
    """
    import numpy as np

    get = lambda k: int(np.sum(np.asarray(counters.get(k, 0))))  # noqa: E731
    changes: dict = {}
    updates: dict = {}
    a2a = get("a2a_overflow")
    if a2a > 0:
        updates["grad_a2a_mult"] = cfg.grad_a2a_mult * 1.5
        changes["a2a_overflow"] = a2a
    gauss = get("gauss_overflow")
    if gauss > 0:
        updates["strip_gauss_mult"] = cfg.strip_gauss_mult * 1.5
        changes["gauss_overflow"] = gauss
    tile = get("tile_overflow")
    if tile > 0:
        updates["max_per_tile"] = cfg.max_per_tile * 2
        changes["tile_overflow"] = tile
    cap = get("capacity_overflow")
    if cap > 0:
        cap_now = cfg.instance_capacity(shard_gaussians)
        updates["capacity"] = int((cap_now + cap) * 1.3)
        changes["capacity_overflow"] = cap
    if not updates:
        return cfg, None
    changes.update({k + "_regrow": v for k, v in updates.items()})
    return dataclasses.replace(cfg, **updates), changes


# Spherical-harmonics constants (common.glsl:16-33; identical to the standard
# real-SH band coefficients used by upstream 3DGS).
SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
