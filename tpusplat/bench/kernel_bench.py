"""Kernel-only bench at garden scale: times _run_forward/_run_backward.

Used to bisect kernel variants on real hardware without paying the full
pipeline's compile time; inputs are cached to /tmp/kbench_cache.npz after
the first run. Findings live in docs/PROFILE.md.

Run: python -m tpusplat.bench.kernel_bench
"""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jax.device_get(leaf.ravel()[0])


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _force(out)

    def run(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn(*args)
        _force(o)
        return time.perf_counter() - t0

    t1 = run(2)
    t2 = run(2 + iters)
    return (t2 - t1) / iters * 1e3


def main():
    from tpusplat.camera import look_at_camera
    from tpusplat.config import RenderConfig
    from tpusplat.io.synthetic import random_scene
    from tpusplat.ops import binning
    from tpusplat.ops.preprocess import preprocess
    from tpusplat.ops import rasterize_pallas as rp
    import dataclasses

    n, w, h = 1_400_000, 1920, 1080
    params = random_scene(n, seed=0, sh_degree=3, scale_range=(0.002, 0.02),
                          extent=4.0)
    cam = look_at_camera([0.0, 0.5, 9.0], [0.0, 0.0, 0.0], w, h, fov_deg=60.0)
    cfg = RenderConfig(sh_degree=3, capacity_mult=4, use_pallas=True,
                       max_per_tile=4096, tight_radius=True)
    needed = int(jax.jit(lambda p: jnp.sum(preprocess(p, cam, cfg).ntiles))(params))
    cfg = dataclasses.replace(cfg, capacity=int(needed * 1.05))
    tiles_x, tiles_y = cfg.tile_grid(w, h)
    num_tiles = tiles_x * tiles_y

    import os
    import numpy as np
    # Cache keyed on everything that shapes the inputs — a stale cache after
    # a packing-layout or scene change would silently skew kernel bisection.
    key = f"{n}-{w}-{h}-{cfg.capacity}-{rp.ATTR_W}-{rp.WIN}-{cfg.tight_radius}"
    cache = f"/tmp/kbench_cache_{key}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        attr = jnp.asarray(z["attr"]); starts = jnp.asarray(z["starts"]); ends = jnp.asarray(z["ends"])
    else:
        @jax.jit
        def prep(params):
            pg = preprocess(params, cam, cfg)
            binned = binning.bin_and_sort(pg, w, h, cfg)
            attr = rp.pack_instances(pg, binned)
            return attr, binned.tile_start, binned.tile_end

        attr, starts, ends = prep(params)
        _force(attr)
        np.savez(cache, attr=np.asarray(attr), starts=np.asarray(starts), ends=np.asarray(ends))
    t_pad = -(-num_tiles // rp.GROUP) * rp.GROUP
    starts_p = jnp.pad(starts, (0, t_pad - num_tiles))
    ends_p = jnp.pad(ends, (0, t_pad - num_tiles))
    row0 = jnp.zeros((1,), jnp.int32)
    static = dict(tiles_x=tiles_x, num_tiles=num_tiles,
                  tile_w=cfg.tile_w, tile_h=cfg.tile_h, cfg=cfg)

    fwd = jax.jit(partial(rp._run_forward, **static))
    t_fwd = timeit(fwd, attr, starts_p, ends_p, row0)
    out = fwd(attr, starts_p, ends_p, row0)
    cot = jnp.zeros_like(out).at[:, 0:3, :].set(1.0 / (w * h * 3))
    bwd = jax.jit(partial(rp._run_backward, **static))
    t_bwd = timeit(bwd, attr, starts_p, ends_p, row0, cot, out)
    print(f"RESULT fwd={t_fwd:.2f}ms bwd={t_bwd:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
