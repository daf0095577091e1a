"""Condensed strip-mode measurement for the driver bench artifact.

bench.py calls this so BENCH_r{N}.json carries the v5e-8 strip projection
as a measured line (VERDICT r4 asked that no headline number live only in
README prose). The full-detail version with per-strip tables and both
gradient-exchange variants is bench/strip_bench.py; this one measures the
production configuration — per-strip fwd+bwd through the default dense
exchange pipeline (strip compaction on) — and applies the same projection
arithmetic as docs/SCALING.md: per-chip frame = max strip − full-N
preprocess + shard preprocess + ICI comm from exact byte volumes at 50%
of the v5e datasheet bandwidth.
"""

from __future__ import annotations

from functools import partial

from tpusplat.bench.strip_bench import timeit as _strip_timeit


def _timeit(fn, *args, iters=4):
    t, out = _strip_timeit(fn, *args, iters=iters)
    return max(t, 0.0), out


def measure_strip_projection(params, cam, cfg, shards=8, iters=4,
                             t_full_ms=None):
    """Measure per-strip fwd+bwd on this chip and project the v5e-8 frame.

    Returns dict with strip_ms_max, frame_ms, mpix_per_s and (when
    ``t_full_ms``, the measured single-chip full-frame fwd+bwd, is given)
    scaling_eff_vs_1chip.
    """
    import jax
    import jax.numpy as jnp

    from tpusplat.ops.binning import bin_and_sort
    from tpusplat.ops.preprocess import preprocess
    from tpusplat.ops.rasterize_pallas import rasterize_pallas
    from tpusplat.train.step import merge_trainable, split_trainable

    n = params.num_gaussians
    w, h = cam.width, cam.height
    tiles_x, tiles_y = cfg.tile_grid(w, h)
    nrows = -(-tiles_y // shards)
    gcap = cfg.strip_gauss_capacity(n, nrows, tiles_y)

    pre = jax.jit(partial(preprocess, cfg=cfg))
    needed = int(jnp.sum(pre(params, cam).ntiles))
    cap_strip = max(1024, -(-int(needed / shards * 1.35) // 1024) * 1024)

    trainable, alive = split_trainable(params)

    def strip_loss(tr, row0):
        pg = preprocess(merge_trainable(tr, alive), cam, cfg)
        binned = bin_and_sort(pg, w, h, cfg, row0, nrows, cap_strip,
                              gauss_capacity=gcap)
        img, aux = rasterize_pallas(pg, binned, w, h, cfg, row0, nrows)
        return jnp.sum(img * img), (aux["capacity_overflow"],
                                    aux["gauss_overflow"])

    grad_strip = jax.jit(jax.grad(strip_loss, has_aux=True))
    strip_ms = []
    for s in range(shards):
        t, (_, (ovf, govf)) = _timeit(
            grad_strip, trainable, jnp.asarray(s * nrows, jnp.int32),
            iters=iters)
        assert int(ovf) == 0, f"strip {s} instance overflow"
        assert int(govf) == 0, f"strip {s} gauss-cap overflow"
        strip_ms.append(t)

    # Preprocess correction uses fwd+BWD at both sizes: the per-strip
    # grad measurement above differentiates through full-N preprocess,
    # while the real sharded chip pays only the N/S one.
    def pre_grad_loss(tr, alv):
        pg2 = preprocess(merge_trainable(tr, alv), cam, cfg)
        return (jnp.sum(pg2.uv) + jnp.sum(pg2.conic) + jnp.sum(pg2.opacity)
                + jnp.sum(pg2.color) + jnp.sum(pg2.depth))

    pre_g = jax.jit(jax.grad(pre_grad_loss))
    params_shard = jax.tree_util.tree_map(
        lambda x: x[: n // shards] if hasattr(x, "shape") and x.shape
        and x.shape[0] == n else x, params)
    t_pre_shard, _ = _timeit(pre_g, *split_trainable(params_shard), iters=40)
    t_pre_full, _ = _timeit(pre_g, *split_trainable(params), iters=10)

    from tpusplat.parallel.collectives import tile_exchange_bytes

    xb = tile_exchange_bytes(n, shards)  # shared accounting w/ strip_bench
    comm_ms = (xb["allgather"] + xb["psum_scatter"]) / (100.0 * 1e6)  # ICI @50%
    frame_ms = max(strip_ms) - t_pre_full + t_pre_shard + comm_ms
    return dict(
        strip_ms_max=round(max(strip_ms), 2),
        strip_ms=[round(t, 2) for t in strip_ms],
        comm_ms=round(comm_ms, 2),
        frame_ms=round(frame_ms, 2),
        mpix_per_s=round(w * h / 1e6 / frame_ms * 1e3, 1),
        scaling_eff_vs_1chip=(
            round(t_full_ms / (shards * frame_ms), 3)
            if t_full_ms else None),
    )
