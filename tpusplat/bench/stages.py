"""Per-stage timing — the analogue of the reference's QueryManager timestamp
pairs around every pipeline stage (``src/Renderer.cpp:484-526,580-699``,
``src/vulkan/QueryManager.cpp:22-56``). Each stage is jitted separately and
timed with block_until_ready; stage names mirror the reference's
(preprocess, prefix_sum+preprocess_sort+sort -> binning, tile_boundary is
part of binning, render -> rasterize).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

from tpusplat.config import RenderConfig
from tpusplat.ops.binning import bin_and_sort
from tpusplat.ops.preprocess import preprocess
from tpusplat.ops.rasterize_xla import rasterize_xla
from tpusplat.types import Camera, GaussianParams


def _force(out):
    """Synchronize via a host transfer of one element — block_until_ready
    can be a no-op on tunneled/remote backends."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)


def _timeit(fn, *args, iters=5):
    out = fn(*args)
    _force(out)

    def run(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn(*args)
        _force(o)
        return time.perf_counter() - t0

    k1 = max(1, iters // 2)
    t1 = run(k1)
    t2 = run(k1 + iters)
    return (t2 - t1) / iters * 1e3, out  # ms


def time_stages(params: GaussianParams, camera: Camera, cfg: RenderConfig,
                iters: int = 5, backward: bool = False) -> dict:
    """Returns {stage: ms}. Stage splits mirror SURVEY.md §2.2."""
    w, h = camera.width, camera.height
    res = {}

    pre = jax.jit(partial(preprocess, cfg=cfg))
    res["preprocess"], pg = _timeit(pre, params, camera, iters=iters)

    bins = jax.jit(partial(bin_and_sort, width=w, height=h, cfg=cfg))
    res["binning_sort"], binned = _timeit(bins, pg, iters=iters)

    if cfg.use_pallas:
        from tpusplat.ops.rasterize_pallas import rasterize_pallas

        rast = jax.jit(partial(rasterize_pallas, width=w, height=h, cfg=cfg))
    else:
        rast = jax.jit(partial(rasterize_xla, width=w, height=h, cfg=cfg))
    res["rasterize"], (img, aux) = _timeit(rast, pg, binned, iters=iters)

    if backward:
        def fwd_loss(p):
            pg2 = preprocess(p, camera, cfg)
            b2 = bin_and_sort(pg2, w, h, cfg)
            if cfg.use_pallas:
                from tpusplat.ops.rasterize_pallas import rasterize_pallas as rp

                img2, _ = rp(pg2, b2, w, h, cfg)
            else:
                img2, _ = rasterize_xla(pg2, b2, w, h, cfg)
            return jnp.mean(img2 * img2)

        gfn = jax.jit(jax.grad(lambda p: fwd_loss(p), allow_int=True))
        res["full_fwd_bwd"], _ = _timeit(gfn, params, iters=iters)

    res["num_instances"] = int(aux["num_instances"])
    return res
