"""Strip-mode hardware measurements: the per-chip inputs of the v5e-8
projection in docs/SCALING.md.

An 8-way tile-sharded frame (parallel/sharded.py) does, per chip:

  1. preprocess its N/8 Gaussian shard,
  2. all-gather the compact screen-space attributes over ICI,
  3. bin + sort + blend (fwd+bwd) ONLY its strip of tile rows at ~C/8
     instance capacity,
  4. psum-scatter the attribute gradients back (transpose of 2).

Steps 1 and 3 are pure single-chip work at shard scale — this bench
measures them on the real chip for every strip (row0 = 0..7, one compiled
executable with traced row0, exactly the multi-chip code path). Step 2/4
byte volumes are computed exactly; only the ICI bandwidth is a datasheet
number, and the projection reports a sensitivity range for it.

Run: python -m tpusplat.bench.strip_bench [n_shards]
Prints a JSON object with every measured input + the projection.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial


def _force(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jax.device_get(leaf.ravel()[0])


def timeit(fn, *args, iters=6):
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
    return (t2 - t1) / iters * 1e3, out


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpusplat.camera import look_at_camera
    from tpusplat.config import RenderConfig
    from tpusplat.io.synthetic import random_scene
    from tpusplat.ops.binning import bin_and_sort
    from tpusplat.ops.preprocess import preprocess
    from tpusplat.ops.rasterize_pallas import rasterize_pallas
    from tpusplat.train.step import merge_trainable, split_trainable

    shards = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n, w, h = 1_400_000, 1920, 1080
    params = random_scene(n, seed=0, sh_degree=3, scale_range=(0.002, 0.02),
                          extent=4.0)
    cam = look_at_camera([0.0, 0.5, 9.0], [0.0, 0.0, 0.0], w, h, fov_deg=60.0)
    cfg = RenderConfig(sh_degree=3, use_pallas=True, max_per_tile=4096,
                       tight_radius=True)
    tiles_x, tiles_y = cfg.tile_grid(w, h)
    nrows = -(-tiles_y // shards)

    res: dict = {"n": n, "w": w, "h": h, "shards": shards, "nrows": nrows}

    # --- 1. per-shard preprocess (N/8 Gaussians) ---
    params_shard = jax.tree_util.tree_map(
        lambda x: x[: n // shards] if hasattr(x, "shape") and x.shape
        and x.shape[0] == n else x, params)
    pre_sh = jax.jit(partial(preprocess, cfg=cfg))
    # Sub-ms op: needs many iterations to rise above the two-run timing
    # noise floor (and clamp: a negative difference is pure noise).
    t_pre_sh, _ = timeit(pre_sh, params_shard, cam, iters=50)
    res["t_preprocess_shard_ms"] = round(max(t_pre_sh, 0.0), 3)

    # Full preprocess once (every shard sees all Gaussians post-gather).
    pg = jax.jit(partial(preprocess, cfg=cfg))(params, cam)
    needed = int(jnp.sum(pg.ntiles))
    res["instances_total"] = needed

    # Strip capacity: worst strip + 10% (measured below); start from an
    # even split + 30% imbalance allowance, grow if any strip overflows.
    cap_strip = max(1024, -(-int(needed / shards * 1.35) // 1024) * 1024)

    # --- 2. strip bin+sort+raster fwd+bwd, one executable, traced row0 ---
    trainable, alive = split_trainable(params)

    gcap = cfg.strip_gauss_capacity(n, nrows, tiles_y)
    res["gauss_capacity_strip"] = gcap

    def strip_loss(tr, row0):
        p = merge_trainable(tr, alive)
        pg = preprocess(p, cam, cfg)
        binned = bin_and_sort(pg, w, h, cfg, row0, nrows, cap_strip,
                              gauss_capacity=gcap)
        img, aux = rasterize_pallas(pg, binned, w, h, cfg, row0, nrows)
        # BOTH truncation channels must stay zero or the timed workload is
        # a silently cheaper render (gauss_overflow split out of overflow
        # in r5 — the assert must cover it separately now).
        return jnp.sum(img * img), (aux["num_instances"],
                                    aux["capacity_overflow"]
                                    + aux["gauss_overflow"])

    grad_strip = jax.jit(jax.grad(strip_loss, has_aux=True))

    # Viewer mode (the reference's headline use-case): forward-only strip.
    fwd_strip = jax.jit(strip_loss)
    fwd_ms = []
    for s in range(shards):
        row0 = jnp.asarray(s * nrows, jnp.int32)
        t, _ = timeit(fwd_strip, trainable, row0, iters=12)
        fwd_ms.append(round(max(t, 0.0), 2))
    res["strip_fwd_only_ms"] = fwd_ms
    res["strip_fwd_only_ms_max"] = max(fwd_ms)

    strip_ms, strip_inst = [], []
    for s in range(shards):
        row0 = jnp.asarray(s * nrows, jnp.int32)
        t, (_, (inst, ovf)) = timeit(grad_strip, trainable, row0, iters=12)
        t = max(t, 0.0)  # sub-noise-floor partial strips
        assert int(ovf) == 0, f"strip {s} overflow {int(ovf)} (cap {cap_strip})"
        strip_ms.append(round(t, 2))
        strip_inst.append(int(inst))
    res["cap_strip"] = cap_strip
    res["strip_fwd_bwd_ms"] = strip_ms
    res["strip_instances"] = strip_inst
    res["strip_ms_max"] = max(strip_ms)
    res["strip_ms_mean"] = round(sum(strip_ms) / len(strip_ms), 2)

    # --- 2a. PRODUCTION-precision variant (mm_precision="default": one
    # bf16 MXU pass in the blend kernels, gate-bounded ~0.5% error —
    # TPU_GATE production block). The headline 8-chip number must be a
    # hardware measurement end-to-end, not a paper -13% (VERDICT r4 #2).
    import dataclasses as _dc

    cfg_prod = _dc.replace(cfg, mm_precision="default")

    def strip_loss_prod(tr, row0):
        p = merge_trainable(tr, alive)
        pg = preprocess(p, cam, cfg_prod)
        binned = bin_and_sort(pg, w, h, cfg_prod, row0, nrows, cap_strip,
                              gauss_capacity=gcap)
        img, aux = rasterize_pallas(pg, binned, w, h, cfg_prod, row0, nrows)
        return jnp.sum(img * img), (aux["num_instances"],
                                    aux["capacity_overflow"]
                                    + aux["gauss_overflow"])

    grad_prod = jax.jit(jax.grad(strip_loss_prod, has_aux=True))
    prod_ms = []
    for s in range(shards):
        row0 = jnp.asarray(s * nrows, jnp.int32)
        t, (_, (_, ovf)) = timeit(grad_prod, trainable, row0, iters=12)
        assert int(ovf) == 0
        prod_ms.append(round(max(t, 0.0), 2))
    res["strip_fwd_bwd_production_ms"] = prod_ms
    res["strip_production_ms_max"] = max(prod_ms)

    # --- 2b. compact-gradient exchange variant (grad_exchange="compact",
    # parallel/compact_grad.py): single-chip cost emulation — identical
    # per-stage shapes/compute to the real all_to_all path, collectives
    # replaced by identity and modeled from byte volumes below. The dense
    # loop above IS the grad_exchange="dense" per-chip cost (its backward
    # reduces a dense [16, N] table).
    from tpusplat.parallel.compact_grad import (
        CompactStatic, a2a_bucket_cap, exchange_render_emulated,
        pack_exchange_table,
    )

    if gcap is not None:
        st = CompactStatic(
            cfg=cfg, width=w, height=h, nrows=nrows, cap_shard=cap_strip,
            gcap=gcap, n_total=n, n_local=n // shards, n_shards=shards,
            axis=None)

        def strip_loss_c(tr, row0f):
            p = merge_trainable(tr, alive)
            pg = preprocess(p, cam, cfg)
            table = pack_exchange_table(pg)[None]  # [1, N, 16] "gathered"
            img, counters = exchange_render_emulated(table, row0f, st)
            return jnp.sum(img * img), (counters["capacity_overflow"]
                                        + counters["gauss_overflow"],
                                        counters["a2a_overflow"])

        grad_c = jax.jit(jax.grad(strip_loss_c, has_aux=True))
        compact_ms = []
        for s in range(shards):
            row0f = jnp.asarray(s * nrows, jnp.float32)
            t, (_, (ovf, a2a)) = timeit(grad_c, trainable, row0f, iters=12)
            assert int(np.sum(np.asarray(ovf))) == 0, f"strip {s} overflow"
            assert int(np.sum(np.asarray(a2a))) == 0, (
                f"strip {s} a2a bucket overflow — raise grad_a2a_mult")
            compact_ms.append(round(max(t, 0.0), 2))
        res["a2a_bucket_cap"] = a2a_bucket_cap(st)
        res["strip_fwd_bwd_compact_ms"] = compact_ms
        res["strip_compact_ms_max"] = max(compact_ms)

    # NOTE: this full-pipeline-per-strip measurement INCLUDES the full-N
    # preprocess (forward AND backward — jax.grad differentiates through
    # it) + depth argsort + emission prep each strip would NOT repeat...
    # they would: each chip preprocesses N/8 then all-gathers, but
    # argsort/cumsum/meta run at full N on every chip. Only the preprocess
    # portion is replaced by the shard-sized one; correct for the
    # difference with the measured fwd+bwd preprocess cost at both sizes
    # (round 4 subtracted the forward only, overcounting the per-chip
    # frame by the full-N preprocess VJP, ~1-2 ms).
    t_pre_full, _ = timeit(jax.jit(partial(preprocess, cfg=cfg)), params, cam)
    res["t_preprocess_full_ms"] = round(t_pre_full, 2)

    def pre_grad_loss(tr, alv):
        pg2 = preprocess(merge_trainable(tr, alv), cam, cfg)
        return (jnp.sum(pg2.uv) + jnp.sum(pg2.conic) + jnp.sum(pg2.opacity)
                + jnp.sum(pg2.color) + jnp.sum(pg2.depth))

    pre_g = jax.jit(jax.grad(pre_grad_loss))
    tr_full, alv_full = split_trainable(params)
    tr_sh, alv_sh = split_trainable(params_shard)
    t_pre_grad_full, _ = timeit(pre_g, tr_full, alv_full, iters=12)
    t_pre_grad_shard, _ = timeit(pre_g, tr_sh, alv_sh, iters=40)
    res["t_preprocess_fwdbwd_full_ms"] = round(t_pre_grad_full, 2)
    res["t_preprocess_fwdbwd_shard_ms"] = round(max(t_pre_grad_shard, 0.0), 3)

    # --- 3. exact communication volumes (shared accounting:
    # parallel/collectives.tile_exchange_bytes — 16 f32 attr columns
    # gathered, 9 live gradient rows psum-scattered back) ---
    from tpusplat.parallel.collectives import tile_exchange_bytes

    xb = tile_exchange_bytes(n, shards)
    ag_bytes, rs_bytes = xb["allgather"], xb["psum_scatter"]
    res["allgather_mbytes"] = round(ag_bytes / 1e6, 1)
    res["reduce_scatter_mbytes"] = round(rs_bytes / 1e6, 1)

    # --- 3b. single-chip full-frame reference (efficiency denominator) ---
    cap_full = max(1024, -(-int(needed * 1.05) // 1024) * 1024)

    def full_loss(tr):
        p = merge_trainable(tr, alive)
        pg = preprocess(p, cam, cfg)
        binned = bin_and_sort(pg, w, h, cfg, 0, tiles_y, cap_full)
        img, aux = rasterize_pallas(pg, binned, w, h, cfg)
        return jnp.sum(img * img), aux["capacity_overflow"]

    t_full, (_, ovf) = timeit(jax.jit(jax.grad(full_loss, has_aux=True)),
                              trainable)
    assert int(ovf) == 0
    res["t_full_frame_1chip_ms"] = round(t_full, 2)

    # --- 4. projection ---
    # Per-chip frame = shard preprocess + (strip pipeline - full
    # preprocess) critical path + comm. ICI effective bandwidth is the one
    # non-measured input: v5e datasheet 1,600 Gbps/chip; report 50%..100%
    # efficiency (100..200 GB/s).
    mpix = w * h / 1e6

    def project(strip_max_ms, bwd_bytes):
        pipe = (strip_max_ms - res["t_preprocess_fwdbwd_full_ms"]
                + res["t_preprocess_fwdbwd_shard_ms"])
        proj = {}
        for eff_gbps, label in ((100.0, "ici_50pct"), (200.0, "ici_100pct")):
            comm_ms = (ag_bytes + bwd_bytes) / (eff_gbps * 1e6)
            frame_ms = pipe + comm_ms
            proj[label] = {
                "comm_ms": round(comm_ms, 2),
                "frame_ms": round(frame_ms, 2),
                "mpix_per_s": round(mpix / frame_ms * 1e3, 1),
                "scaling_eff_vs_1chip": round(
                    t_full / (shards * frame_ms), 3),
            }
        return pipe, proj

    pipe_ms, res["projection_v5e8"] = project(res["strip_ms_max"], rs_bytes)
    res["pipe_ms_per_chip"] = round(pipe_ms, 2)
    if "strip_production_ms_max" in res:
        pipe_p, res["projection_v5e8_production"] = project(
            res["strip_production_ms_max"], rs_bytes)
        res["pipe_ms_per_chip_production"] = round(pipe_p, 2)
    if "strip_compact_ms_max" in res:
        # Compact exchange replaces the dense psum-scatter with per-chip
        # all_to_all sends of (S-1) buckets of 16 f32 rows + ids.
        cap_b = res["a2a_bucket_cap"]
        a2a_bytes = (16 + 1) * cap_b * 4 * (shards - 1)
        pipe_c, res["projection_v5e8_compact"] = project(
            res["strip_compact_ms_max"], a2a_bytes)
        res["pipe_ms_per_chip_compact"] = round(pipe_c, 2)
        res["a2a_mbytes"] = round(a2a_bytes / 1e6, 1)
    # Viewer-mode projection: fwd-only needs the all-gather but no
    # gradient scatter-back.
    fwd_pipe = (res["strip_fwd_only_ms_max"] - t_pre_full
                + res["t_preprocess_shard_ms"])
    fwd_frame = fwd_pipe + ag_bytes / (100.0 * 1e6)
    res["projection_v5e8_viewer"] = {
        "frame_ms": round(fwd_frame, 2),
        "fps_1080p": round(1e3 / fwd_frame, 1),
        "mpix_per_s": round(mpix / fwd_frame * 1e3, 1),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
