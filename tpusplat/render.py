"""The rendering pipeline facade.

The analogue of the reference's ``Renderer`` orchestrator
(``src/Renderer.cpp:366-426``: preprocess -> prefix sum -> key expansion ->
radix sort -> tile boundaries -> blend), expressed as one jittable function.
XLA's dataflow ordering replaces the reference's pipeline barriers and
ping-pong descriptor options; donation and async dispatch replace its
fences/frames-in-flight; there is no per-frame host readback (the
reference's structural stall at ``src/Renderer.cpp:391-395,538``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpusplat.config import RenderConfig
from tpusplat.ops.binning import bin_and_sort
from tpusplat.ops.preprocess import preprocess
from tpusplat.ops.rasterize_xla import rasterize_xla
from tpusplat.types import Camera, GaussianParams


@partial(jax.jit, static_argnames=("cfg",))
def render_stages(params: GaussianParams, camera: Camera, cfg: RenderConfig):
    """Full pipeline, returning the image and diagnostic aux outputs.

    aux contains: transmittance map, num_instances, capacity_overflow (the
    analogue of the reference's dynamic sort-buffer growth trigger,
    ``src/Renderer.cpp:541-563`` — nonzero means re-jit with a larger
    ``capacity_mult``), tile_overflow (XLA path only).
    """
    # named scopes mirror the reference's per-stage timestamp labels
    # (src/Renderer.cpp:484-699) for jax.profiler traces.
    with jax.named_scope("gs_preprocess"):
        pg = preprocess(params, camera, cfg)
    with jax.named_scope("gs_binning_sort"):
        binned = bin_and_sort(pg, camera.width, camera.height, cfg)
    with jax.named_scope("gs_rasterize"):
        if cfg.use_pallas:
            from tpusplat.ops.rasterize_pallas import rasterize_pallas

            img, aux = rasterize_pallas(pg, binned, camera.width, camera.height, cfg)
        else:
            img, aux = rasterize_xla(pg, binned, camera.width, camera.height, cfg)
    # Per-Gaussian visibility/extent stats for densification (train/densify.py).
    aux["visible"] = pg.ntiles > 0
    aux["radius"] = pg.radius
    if cfg.debug_checks:
        from tpusplat.ops import validate

        with jax.named_scope("gs_validate"):
            aux["debug"] = {
                **validate.check_processed(pg),
                **validate.check_binned(binned, params.means.shape[0]),
                **validate.check_image(img),
            }
    return img, aux


@partial(jax.jit, static_argnames=("cfg",))
def _stage_preprocess(params, camera, cfg):
    return preprocess(params, camera, cfg)


@partial(jax.jit, static_argnames=("width", "height", "cfg"))
def _stage_binning(pg, width, height, cfg):
    return bin_and_sort(pg, width, height, cfg)


@partial(jax.jit, static_argnames=("width", "height", "cfg"))
def _stage_rasterize(pg, binned, width, height, cfg):
    if cfg.use_pallas:
        from tpusplat.ops.rasterize_pallas import rasterize_pallas

        return rasterize_pallas(pg, binned, width, height, cfg)
    return rasterize_xla(pg, binned, width, height, cfg)


def render_profiled(params: GaussianParams, camera: Camera, cfg: RenderConfig):
    """Render one frame as separately-jitted stages with host fences,
    returning (img, aux, stage_ms).

    The live per-stage timing source for the interactive viewer's metrics
    overlay — the analogue of the reference's Vulkan timestamp queries
    (``src/Renderer.cpp:484-699``, displayed by ``src/GUIManager.cpp:45-100``).
    A TPU has no free in-stream timestamps, so a profiled frame pays one
    device fence per stage; callers sample it every N frames and render the
    rest through the fused ``render_stages`` path.
    """
    import time

    stage_ms: dict[str, float] = {}

    def timed(name, fn, *args):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        stage_ms[name] = (time.perf_counter() - t0) * 1e3
        return out

    w, h = camera.width, camera.height
    pg = timed("preprocess", _stage_preprocess, params, camera, cfg)
    binned = timed("bin+sort", _stage_binning, pg, w, h, cfg)
    img, aux = timed("raster", _stage_rasterize, pg, binned, w, h, cfg)
    aux["visible"] = pg.ntiles > 0
    aux["radius"] = pg.radius
    return img, aux, stage_ms


def render(params: GaussianParams, camera: Camera, cfg: RenderConfig | None = None):
    """Render one image [H, W, 3] float32 (the ``draw()`` analogue)."""
    if cfg is None:
        cfg = RenderConfig()
    img, aux = render_stages(params, camera, cfg)
    if cfg.debug_checks:
        from tpusplat.ops.validate import raise_on_violations

        raise_on_violations(aux)
    return img


def render_auto(
    params: GaussianParams,
    camera: Camera,
    cfg: RenderConfig | None = None,
    max_regrows: int = 4,
    growth: float = 1.3,
):
    """Render with automatic instance-capacity recovery.

    The analogue of the reference's mid-frame sort-buffer overflow handling:
    it grows ``sortBufferSizeMultiplier``, reallocs, re-records and retries
    the frame (``src/Renderer.cpp:541-563``). Here overflow is a device
    counter; on overflow we re-jit with a grown static capacity and retry —
    the retried frame is exact, not merely less-truncated.

    Returns (img, aux, cfg): callers should keep the returned cfg so later
    frames reuse the grown capacity's compiled executable.
    """
    import dataclasses
    import warnings

    if cfg is None:
        cfg = RenderConfig()
    for _ in range(max_regrows + 1):
        img, aux = render_stages(params, camera, cfg)
        overflow = int(aux["capacity_overflow"])
        if overflow <= 0 or max_regrows <= 0:
            break
        cap_now = cfg.instance_capacity(params.num_gaussians)
        needed = cap_now + overflow
        cfg = dataclasses.replace(cfg, capacity=int(needed * growth))
        max_regrows -= 1
    if overflow > 0:
        # Never return a silently truncated frame: the reference retries
        # until its sort buffer fits (src/Renderer.cpp:541-563).
        warnings.warn(
            f"render_auto: image truncated — {overflow} instances beyond "
            f"capacity {cfg.instance_capacity(params.num_gaussians)} after "
            "exhausting max_regrows",
            RuntimeWarning,
            stacklevel=2,
        )
    return img, aux, cfg


def render_batch(params: GaussianParams, cameras: Camera, cfg: RenderConfig | None = None):
    """Render a batch of same-resolution cameras on one device.

    ``cameras`` is a stacked Camera (see ``types.stack_cameras``). Uses
    ``lax.map`` so the Pallas kernels (which do not batch) run per camera;
    per-camera work is large enough that sequencing is free.
    """
    if cfg is None:
        cfg = RenderConfig()
    import jax
    from jax import lax

    w, h = cameras.width, cameras.height

    def one(cam_leaves):
        v, pr, cp, tx, ty = cam_leaves
        cam = Camera(view=v, proj=pr, cam_pos=cp, tan_fovx=tx, tan_fovy=ty,
                     width=w, height=h)
        img, _ = render_stages(params, cam, cfg)
        return img

    return lax.map(
        one, (cameras.view, cameras.proj, cameras.cam_pos,
              cameras.tan_fovx, cameras.tan_fovy)
    )
