"""Fine-grained per-stage profiler at production (garden) scale.

The perf analogue of the reference's QueryManager per-stage timestamps
(``src/Renderer.cpp:484-699``), but split further: each sub-stage of the
binning/sort and the backward pieces is jitted and timed separately so
optimization targets the true bottleneck. Results are printed as a table and
as one JSON object (committed to docs/PROFILE_*.md per round).

Run: python -m tpusplat.bench.profile_detail [garden|mid|small]
     python -m tpusplat.bench.profile_detail strip [n_shards]
(strip mode: per-stage times for ONE strip of tiles_y/n_shards rows at
garden scale — the per-chip breakdown behind docs/SCALING.md, separating
C/8-proportional stages from the N-replicated tax.)
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def timeit(fn, *args, iters=5, **kw):
    out = fn(*args, **kw)
    _force(out)

    def run(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn(*args, **kw)
        _force(o)
        return time.perf_counter() - t0

    k1 = max(1, iters // 2)
    t1 = run(k1)
    t2 = run(k1 + iters)
    return (t2 - t1) / iters * 1e3, out  # ms


def strip_main(shards: int):
    """Per-stage times for one strip (garden/n_shards) — the per-chip
    breakdown behind docs/SCALING.md's N-replication-tax analysis."""
    from tpusplat.camera import look_at_camera
    from tpusplat.config import RenderConfig
    from tpusplat.io.synthetic import random_scene
    from tpusplat.ops import binning
    from tpusplat.ops import rasterize_pallas as rp
    from tpusplat.ops.emission import expand_instances_pallas
    from tpusplat.ops.preprocess import preprocess

    n, w, h = 1_400_000, 1920, 1080
    params = random_scene(n, seed=0, sh_degree=3, scale_range=(0.002, 0.02),
                          extent=4.0)
    cam = look_at_camera([0.0, 0.5, 9.0], [0.0, 0.0, 0.0], w, h, fov_deg=60.0)
    cfg = RenderConfig(sh_degree=3, use_pallas=True, max_per_tile=4096,
                       tight_radius=True)
    tiles_x, tiles_y = cfg.tile_grid(w, h)
    nrows = -(-tiles_y // shards)
    needed = int(jax.jit(
        lambda p: jnp.sum(preprocess(p, cam, cfg).ntiles))(params))
    cap = max(1024, -(-int(needed / shards * 1.35) // 1024) * 1024)
    gcap = cfg.strip_gauss_capacity(n, nrows, tiles_y)
    pg = jax.jit(partial(preprocess, cfg=cfg))(params, cam)
    row0 = jnp.asarray(2 * nrows, jnp.int32)
    res: dict = {"nrows": nrows, "cap_strip": cap, "gauss_capacity": gcap}
    print(f"strip profile: strip 2/{shards} nrows={nrows} cap={cap} "
          f"gcap={gcap} backend={jax.default_backend()}",
          file=sys.stderr, flush=True)

    # The shipped path (binning.bin_and_sort, round 5): the emission meta
    # rides through the depth sort as integer payloads — one stage covers
    # the old argsort + [stream, 2] meta gather.
    def dsort_meta(pg, r0):
        y0c = jnp.clip(pg.aabb[:, 1], r0, r0 + nrows)
        y1c = jnp.clip(pg.aabb[:, 3], r0, r0 + nrows)
        if gcap is not None:
            vis = (pg.ntiles > 0) & (y1c > y0c)
        else:
            vis = pg.ntiles > 0
        key = lax.stop_gradient(
            jnp.where(vis, pg.depth, jnp.float32(jnp.inf)))
        x0 = pg.aabb[:, 0]
        ntiles_m = jnp.where(
            pg.ntiles > 0, (pg.aabb[:, 2] - x0) * jnp.maximum(y1c - y0c, 0), 0)
        bbh = jnp.maximum(y1c - y0c, 1)
        packed = x0 + (y0c << 8) + (bbh << 16)
        _, ids_d, nt_d, pk_d = lax.sort(
            (key, lax.iota(jnp.int32, n), ntiles_m, packed),
            num_keys=1, is_stable=True)
        k = gcap if gcap is not None else n
        return ids_d[:k], nt_d[:k], pk_d[:k], jnp.sum(ntiles_m)

    res["depth_sort_meta"], meta = timeit(jax.jit(dsort_meta), pg, row0)

    exp = jax.jit(partial(expand_instances_pallas, tiles_x=tiles_x,
                          capacity=cap, nrows=nrows))
    res["emission"], (tile, gid, tot, ovf, govf) = timeit(
        lambda pg, r0, m: exp(pg, row0=r0, meta_sorted=m), pg, row0, meta)
    assert int(ovf) == 0 and int(govf) == 0, (
        f"strip overflow {int(ovf)} gauss {int(govf)}")
    res["strip_instances"] = int(tot)

    t_ts, (tile_s, gid_s) = timeit(
        jax.jit(lambda t, g: lax.sort((t, g), num_keys=1, is_stable=True)),
        tile, gid, iters=20)
    res["tile_sort"] = max(t_ts, 0.0)  # sub-ms: clamp the noise floor

    num_tiles = tiles_x * nrows

    def bounds(ts):
        rng = lax.iota(jnp.int32, num_tiles + 1)
        b = binning.searchsorted_left_big(ts, rng)
        return b[:num_tiles], b[1:]

    t_b, (starts, ends) = timeit(jax.jit(bounds), tile_s, iters=20)
    res["boundaries"] = max(t_b, 0.0)

    binned = binning.BinnedInstances(
        gauss_id=gid_s, tile_id=tile_s, tile_start=starts, tile_end=ends,
        num_instances=tot, overflow=ovf, gauss_overflow=govf)
    res["pack_gather"], attr = timeit(jax.jit(rp.pack_instances), pg, binned)

    t_pad = -(-num_tiles // rp.GROUP) * rp.GROUP
    starts_p = jnp.pad(starts, (0, t_pad - num_tiles))
    ends_p = jnp.pad(ends, (0, t_pad - num_tiles))
    static = dict(tiles_x=tiles_x, num_tiles=num_tiles,
                  tile_w=cfg.tile_w, tile_h=cfg.tile_h, cfg=cfg)
    fwd = jax.jit(partial(rp._run_forward, **static))
    res["raster_fwd"], out = timeit(fwd, attr, starts_p, ends_p,
                                    row0.reshape(1))
    cot = jnp.zeros_like(out).at[:, 0:3, :].set(1.0 / (w * h * 3))
    bwd = jax.jit(partial(rp._run_backward, **static))
    res["raster_bwd"], dattr = timeit(bwd, attr, starts_p, ends_p,
                                      row0.reshape(1), cot, out)

    def grad_sort(dattr, gid):
        cols = tuple(dattr[k, :cap] for k in range(rp.GROWS))
        return lax.sort((gid,) + cols, num_keys=1, is_stable=False)

    res["grad_sort"], sorted_ = timeit(jax.jit(grad_sort), dattr, gid_s)

    def segreduce(sorted_):
        gid_sd = sorted_[0]
        grad = jnp.stack(sorted_[1:])
        n_pad = -(-n // (rp.GB * rp.SEGG)) * (rp.GB * rp.SEGG)
        qs = jnp.minimum(lax.iota(jnp.int32, n_pad // rp.GB + 1) * rp.GB,
                         jnp.int32(n))
        b = binning.searchsorted_left_big(gid_sd, qs)
        win = rp._seg_win(cap, n_pad)  # occupancy-adaptive (r5)
        grad = jnp.pad(grad, ((0, rp.GPAD - rp.GROWS), (0, win)))
        gid2d = jnp.pad(gid_sd[None, :], ((0, 0), (0, win)),
                        constant_values=-1)
        g = rp._run_segment_reduce(grad, gid2d, b, n_pad, n, win=win)
        return jnp.transpose(g[:, :n], (1, 0))

    res["segment_reduce"], _ = timeit(jax.jit(segreduce), sorted_)

    width = max(len(k) for k in res)
    for k, v in res.items():
        vv = f"{v:10.2f} ms" if isinstance(v, float) else f"{v!r:>10}"
        print(f"{k:<{width}} {vv}", file=sys.stderr, flush=True)
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in res.items()}))


def main():
    from tpusplat.camera import look_at_camera
    from tpusplat.config import RenderConfig
    from tpusplat.io.synthetic import random_scene
    from tpusplat.ops import binning
    from tpusplat.ops.preprocess import preprocess
    from tpusplat.ops import rasterize_pallas as rp

    conf = sys.argv[1] if len(sys.argv) > 1 else "garden"
    if conf == "strip":
        return strip_main(int(sys.argv[2]) if len(sys.argv) > 2 else 8)
    scale = dict(
        garden=dict(n=1_400_000, w=1920, h=1080, sh=3, cap=4, srange=(0.002, 0.02)),
        bicycle=dict(n=6_000_000, w=1600, h=1063, sh=3, cap=3,
                     srange=(0.0012, 0.012)),
        mid=dict(n=100_000, w=800, h=800, sh=3, cap=8, srange=(0.004, 0.04)),
        small=dict(n=10_000, w=256, h=256, sh=0, cap=8, srange=(0.004, 0.04)),
    )[conf]
    n, w, h = scale["n"], scale["w"], scale["h"]
    params = random_scene(n, seed=0, sh_degree=scale["sh"],
                          scale_range=scale["srange"], extent=4.0)
    cam = look_at_camera([0.0, 0.5, 9.0], [0.0, 0.0, 0.0], w, h, fov_deg=60.0)
    cfg = RenderConfig(sh_degree=scale["sh"], capacity_mult=scale["cap"],
                       use_pallas=True, max_per_tile=4096, tight_radius=True)
    # Same capacity-settling probe as bench.py.
    import dataclasses

    needed = int(jax.jit(
        lambda p: jnp.sum(preprocess(p, cam, cfg).ntiles))(params))
    cfg = dataclasses.replace(cfg, capacity=int(needed * 1.05))
    capacity = cfg.instance_capacity(n)
    tiles_x, tiles_y = cfg.tile_grid(w, h)
    num_tiles = tiles_x * tiles_y
    res: dict[str, float] = {}
    print(f"profile: n={n} {w}x{h} capacity={capacity} tiles={num_tiles} "
          f"backend={jax.default_backend()}", file=sys.stderr, flush=True)

    # ---- forward sub-stages ----
    pre = jax.jit(partial(preprocess, cfg=cfg))
    res["preprocess_fwd"], pg = timeit(pre, params, cam)

    def depth_sort(pg):
        key = lax.stop_gradient(
            jnp.where(pg.ntiles > 0, pg.depth, jnp.float32(jnp.inf)))
        return jnp.argsort(key, stable=True)

    res["depth_argsort_N"], dorder = timeit(jax.jit(depth_sort), pg)

    from tpusplat.ops.emission import expand_instances_pallas

    expand = jax.jit(partial(expand_instances_pallas, tiles_x=tiles_x,
                             capacity=capacity, row0=0, nrows=tiles_y))
    res["expand_instances"], (tile, gid, total, ovf, _govf) = timeit(
        expand, pg, depth_order=dorder)
    expand_x = jax.jit(partial(binning.expand_instances, tiles_x=tiles_x,
                               capacity=capacity, row0=0, nrows=tiles_y))
    res["expand_xla_ref"], _ = timeit(expand_x, pg, depth_order=dorder)

    def big_sort(tile, gid):
        return lax.sort((tile, gid), num_keys=1, is_stable=True)

    res["tile_sort_C"], (tile_s, gid_s) = timeit(jax.jit(big_sort), tile, gid)

    def bounds(tile_s):
        rng = lax.iota(jnp.int32, num_tiles + 1)
        b = binning.searchsorted_left_big(tile_s, rng)
        return b[:num_tiles], b[1:]

    res["tile_boundaries"], (starts, ends) = timeit(jax.jit(bounds), tile_s)

    full_bin = jax.jit(partial(binning.bin_and_sort, width=w, height=h, cfg=cfg))
    res["bin_and_sort_total"], binned = timeit(full_bin, pg)

    pack = jax.jit(rp.pack_instances)
    res["pack_gather"], attr = timeit(pack, pg, binned)

    t_pad = -(-num_tiles // rp.GROUP) * rp.GROUP
    starts_p = jnp.pad(binned.tile_start, (0, t_pad - num_tiles))
    ends_p = jnp.pad(binned.tile_end, (0, t_pad - num_tiles))
    row0_arr = jnp.zeros((1,), jnp.int32)
    static = dict(tiles_x=tiles_x, num_tiles=num_tiles,
                  tile_w=cfg.tile_w, tile_h=cfg.tile_h, cfg=cfg)

    fwd_kernel = jax.jit(partial(rp._run_forward, **static))
    res["raster_fwd_kernel"], out = timeit(fwd_kernel, attr, starts_p, ends_p, row0_arr)

    # ---- backward sub-stages ----
    cot = jnp.zeros_like(out)
    cot = cot.at[:, 0:3, :].set(1.0 / (w * h * 3))
    bwd_kernel = jax.jit(partial(rp._run_backward, **static))
    res["raster_bwd_kernel"], dattr = timeit(
        bwd_kernel, attr, starts_p, ends_p, row0_arr, cot, out)

    def grad_sort(dattr, gid):
        cols = tuple(dattr[k, :capacity] for k in range(rp.GROWS))
        return lax.sort((gid,) + cols, num_keys=1, is_stable=False)

    res["bwd_grad_sort_by_gid"], sorted_ = timeit(
        jax.jit(grad_sort), dattr, binned.gauss_id)

    def segreduce(sorted_):
        gid_sd = sorted_[0]
        grad = jnp.stack(sorted_[1:])
        n_pad = -(-n // (rp.GB * rp.SEGG)) * (rp.GB * rp.SEGG)
        qs = jnp.minimum(lax.iota(jnp.int32, n_pad // rp.GB + 1) * rp.GB,
                         jnp.int32(n))
        bounds_ = binning.searchsorted_left(gid_sd, qs)
        grad = jnp.pad(grad, ((0, rp.GPAD - rp.GROWS), (0, rp.WIN)))
        gid2d = jnp.pad(gid_sd[None, :], ((0, 0), (0, rp.WIN)),
                        constant_values=-1)
        g_sum = rp._run_segment_reduce(grad, gid2d, bounds_, n_pad, n)
        return jnp.transpose(g_sum[:, :n], (1, 0))

    res["bwd_segment_reduce"], _ = timeit(jax.jit(segreduce), sorted_)

    # ---- end-to-end ----
    from tpusplat.render import render_stages
    from tpusplat.train.step import merge_trainable, split_trainable

    trainable, alive = split_trainable(params)

    def fwd_full(tr):
        img, aux = render_stages(merge_trainable(tr, alive), cam, cfg)
        return jnp.sum(img)

    res["e2e_fwd"], _ = timeit(jax.jit(fwd_full), trainable)

    def loss_fn(tr):
        img, _ = render_stages(merge_trainable(tr, alive), cam, cfg)
        return jnp.mean(img * img)

    res["e2e_fwd_bwd"], _ = timeit(jax.jit(jax.grad(loss_fn)), trainable)

    res["num_instances"] = int(binned.num_instances)
    res["capacity"] = capacity
    width = max(len(k) for k in res)
    for k, v in res.items():
        unit = " ms" if isinstance(v, float) else ""
        vv = f"{v:10.2f}" if isinstance(v, float) else f"{v:10d}"
        print(f"{k:<{width}} {vv}{unit}", file=sys.stderr, flush=True)
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
