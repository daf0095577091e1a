"""Permutation-plumbing bench: times the non-blend pipeline stages alone.

The round-3 profile showed ~160 ms of the 294 ms garden frame in XLA
gathers/sorts ("permutation plumbing"); this bench times each replacement
kernel against its XLA baseline at garden scale without paying the full
pipeline compile. Synthetic inputs with production distributions.

Run: python -m tpusplat.bench.plumb_bench [stage ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jax.device_get(leaf.ravel()[0])


def timeit(fn, *args, iters=10):
    fn = jax.jit(fn)
    out = fn(*args)
    _force(out)

    def run(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn(*args)
        _force(o)
        return time.perf_counter() - t0

    t1 = run(max(1, iters // 2))
    t2 = run(max(1, iters // 2) + iters)
    return (t2 - t1) / iters * 1e3


def main():
    from tpusplat.ops import rasterize_pallas as rp
    from tpusplat.ops import binning

    stages = set(sys.argv[1:]) or {"segreduce", "gradsort", "emission"}
    C = 4_397_056  # garden capacity (round-3 bench)
    N = 1_400_000
    rng = np.random.default_rng(0)

    r = {}
    if "emission" in stages:
        import dataclasses

        from tpusplat.camera import look_at_camera
        from tpusplat.config import RenderConfig
        from tpusplat.io.synthetic import random_scene
        from tpusplat.ops.emission import expand_instances_pallas
        from tpusplat.ops.preprocess import preprocess

        params = random_scene(N, seed=0, sh_degree=3,
                              scale_range=(0.002, 0.02), extent=4.0)
        cam = look_at_camera([0.0, 0.5, 9.0], [0.0, 0.0, 0.0], 1920, 1080,
                             fov_deg=60.0)
        cfg = RenderConfig(sh_degree=3, use_pallas=True, tight_radius=True)
        needed = int(jax.jit(
            lambda p: jnp.sum(preprocess(p, cam, cfg).ntiles))(params))
        cfg = dataclasses.replace(cfg, capacity=int(needed * 1.05))
        cap = cfg.instance_capacity(N)
        tiles_x, tiles_y = cfg.tile_grid(1920, 1080)
        pg = jax.jit(lambda p: preprocess(p, cam, cfg))(params)

        def dorder(pg):
            key = lax.stop_gradient(
                jnp.where(pg.ntiles > 0, pg.depth, jnp.float32(jnp.inf)))
            return jnp.argsort(key, stable=True)

        order = jax.jit(dorder)(pg)

        def em_pallas(pg, order):
            return expand_instances_pallas(pg, tiles_x, cap, 0, tiles_y,
                                           order)

        def em_xla(pg, order):
            return binning.expand_instances(pg, tiles_x, cap, 0, tiles_y,
                                            order)

        r["expand_pallas"] = timeit(em_pallas, pg, order)
        r["expand_xla"] = timeit(em_xla, pg, order)
        # correctness spot-check on hardware
        tp, gp, totp, _, _ = jax.jit(em_pallas)(pg, order)
        tx_, gx_, totx, _, _ = jax.jit(em_xla)(pg, order)
        same_t = bool(jnp.all(tp == tx_))
        same_g = bool(jnp.all(gp == gx_))
        r["expand_match"] = float(same_t and same_g and int(totp) == int(totx))
    if {"segreduce", "gradsort"} & stages:
        gid = np.sort(rng.integers(0, N, size=C)).astype(np.int32)
        gid_unsorted = rng.permutation(gid)
        grads = rng.uniform(size=(rp.GROWS, C)).astype(np.float32)
        gid_j = jnp.asarray(gid)
        gidu_j = jnp.asarray(gid_unsorted)
        grads_j = jnp.asarray(grads)

        if "gradsort" in stages:
            def grad_sort(gid, grads):
                return lax.sort((gid,) + tuple(grads), num_keys=1,
                                is_stable=False)

            r["grad_sort_9payload"] = timeit(
                grad_sort, gidu_j, tuple(grads_j[k] for k in range(rp.GROWS)))

        if "segreduce" in stages:
            n_pad = -(-N // (rp.GB * rp.SEGG)) * (rp.GB * rp.SEGG)

            def segreduce(gid_s, grads):
                qs = jnp.minimum(
                    lax.iota(jnp.int32, n_pad // rp.GB + 1) * rp.GB,
                    jnp.int32(N))
                bounds = binning.searchsorted_left(gid_s, qs)
                grad = jnp.pad(grads, ((0, rp.GPAD - rp.GROWS), (0, rp.WIN)))
                gid2d = jnp.pad(gid_s[None, :], ((0, 0), (0, rp.WIN)),
                                constant_values=-1)
                g = rp._run_segment_reduce(grad, gid2d, bounds, n_pad, N)
                return jnp.transpose(g[:, :N], (1, 0))

            r["segreduce_pallas"] = timeit(segreduce, gid_j, grads_j)

    for k, v in r.items():
        print(f"{k:<24} {v:9.2f} ms", file=sys.stderr, flush=True)
    import json
    print(json.dumps({k: round(v, 3) for k, v in r.items()}))


if __name__ == "__main__":
    main()
