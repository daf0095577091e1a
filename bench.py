"""Benchmark harness: forward+backward render throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

North-star metric (BASELINE.json): Mpix/s/chip at 1080p fwd+bwd on a
~1.4M-Gaussian scene. The reference publishes no numbers (BASELINE.md);
vs_baseline is measured against the driver target of 30 fps-equivalent at
1080p = 62.2 Mpix/s.

Env knobs:
  BENCH_CONFIG=garden|mid|small   scene scale (default garden: 1.4M @1080p)
  BENCH_ITERS=N                   timed iterations (default 5)
  BENCH_FWD_ONLY=1                skip backward
  BENCH_XLA=1                     use the XLA rasterizer instead of Pallas
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from tpusplat.camera import look_at_camera
    from tpusplat.config import RenderConfig
    from tpusplat.io.synthetic import random_scene
    from tpusplat.render import render_stages
    from tpusplat.train.step import merge_trainable, split_trainable

    conf = os.environ.get("BENCH_CONFIG", "garden")
    # garden mimics Mip-NeRF360-scale stats: ~1M visible Gaussians, ~4.2M
    # instances at 1080p (mean 4.1 tiles/Gaussian) — calibrated via preprocess.
    scale = dict(
        garden=dict(n=1_400_000, w=1920, h=1080, sh=3, cap=4, srange=(0.002, 0.02)),
        # bicycle: BASELINE config 5's single-chip scale (~6M Gaussians,
        # 1600x1063) — the HBM-fit proof point (attr slab + sort operands).
        bicycle=dict(n=6_000_000, w=1600, h=1063, sh=3, cap=3,
                     srange=(0.0012, 0.012)),
        mid=dict(n=100_000, w=800, h=800, sh=3, cap=8, srange=(0.004, 0.04)),
        small=dict(n=10_000, w=256, h=256, sh=0, cap=8, srange=(0.004, 0.04)),
    )[conf]
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    fwd_only = os.environ.get("BENCH_FWD_ONLY", "") == "1"
    use_pallas = os.environ.get("BENCH_XLA", "") != "1"

    log(f"bench: backend={jax.default_backend()} config={conf} {scale} "
        f"fwd_only={fwd_only} pallas={use_pallas}")

    n, w, h = scale["n"], scale["w"], scale["h"]
    params = random_scene(n, seed=0, sh_degree=scale["sh"],
                          scale_range=scale["srange"], extent=4.0)
    cam = look_at_camera([0.0, 0.5, 9.0], [0.0, 0.0, 0.0], w, h, fov_deg=60.0)
    cfg = RenderConfig(
        sh_degree=scale["sh"], capacity_mult=scale["cap"],
        use_pallas=use_pallas, max_per_tile=4096, tile_chunk=64,
        tight_radius=True,
    ).with_env_overrides()  # e.g. TPUSPLAT_MM_PRECISION=default fast-math run
    # Settle the static instance capacity from a cheap preprocess probe —
    # the steady state the reference's dynamic sort-buffer growth reaches
    # (src/Renderer.cpp:541-563). render_auto would converge to the same
    # size; probing avoids one throwaway full-pipeline compile.
    import dataclasses

    import jax.numpy as _jnp

    from tpusplat.ops.preprocess import preprocess as _pre

    needed = int(jax.jit(
        lambda p: _jnp.sum(_pre(p, cam, cfg).ntiles))(params))
    cfg = dataclasses.replace(cfg, capacity=int(needed * 1.05))
    log(f"instance probe: {needed} -> capacity {cfg.instance_capacity(n)}")

    trainable, alive = split_trainable(params)
    target = jnp.zeros((h, w, 3), jnp.float32)

    if fwd_only:
        def step(tr):
            img, aux = render_stages(merge_trainable(tr, alive), cam, cfg)
            return jnp.sum(img), aux["num_instances"], aux["capacity_overflow"]
    else:
        def loss_fn(tr):
            img, aux = render_stages(merge_trainable(tr, alive), cam, cfg)
            return jnp.mean((img - target) ** 2), aux

        def step(tr):
            (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(tr)
            return jnp.sum(g["means"]), aux["num_instances"], aux["capacity_overflow"]

    step = jax.jit(step)

    t0 = time.time()
    out = step(trainable)
    s = float(out[0])  # force execution (block_until_ready can be a no-op
    # on tunneled backends, so timing uses a host transfer as the fence)
    log(f"compile+first run: {time.time() - t0:.1f}s  "
        f"instances={int(out[1])} overflow={int(out[2])}")
    if int(out[2]) > 0:
        log("WARNING: capacity overflow — raise capacity_mult")

    def run(k):
        t0 = time.time()
        o = None
        for _ in range(k):
            o = step(trainable)
        _ = float(o[0])
        return time.time() - t0

    t_small = run(max(1, iters // 4))
    t_big = run(iters + max(1, iters // 4))
    dt = (t_big - t_small) / iters

    # The capacity probe used the initial params; assert the timed workload
    # was never truncated (a shrunken instance count would skew the timing).
    final = step(trainable)
    assert int(final[2]) == 0, (
        f"bench invalid: capacity overflow {int(final[2])} during timed runs"
    )

    mpix = w * h / 1e6 / dt
    baseline = 62.2  # 30 fps-equivalent at 1080p (driver target)
    mode = "fwd" if fwd_only else "fwd+bwd"
    log(f"{mode}: {dt * 1e3:.1f} ms/frame -> {mpix:.1f} Mpix/s")

    # Production-mode line (bf16 single-pass matmuls — the configuration a
    # training run would use; its measured image/grad error bound is
    # recorded by the TPU gate's mm_precision=default block). Reported as
    # an EXTRA labelled line; the headline (last line, parsed by the
    # driver) stays the parity-precision number the north-star metric's
    # allclose requirement refers to.
    if (conf == "garden" and not fwd_only and cfg.mm_precision == "highest"
            and os.environ.get("BENCH_PRODUCTION", "1") != "0"):
        cfg_prod = dataclasses.replace(cfg, mm_precision="default")

        def loss_prod(tr):
            img, aux = render_stages(merge_trainable(tr, alive), cam, cfg_prod)
            return jnp.mean((img - target) ** 2), aux

        @jax.jit
        def step_prod(tr):
            (l, aux), g = jax.value_and_grad(loss_prod, has_aux=True)(tr)
            return (jnp.sum(g["means"]), aux["num_instances"],
                    aux["capacity_overflow"])

        t0 = time.time()
        _ = float(step_prod(trainable)[0])
        log(f"production compile+first run: {time.time() - t0:.1f}s")

        def run_prod(k):
            t0 = time.time()
            o = None
            for _ in range(k):
                o = step_prod(trainable)
            _ = float(o[0])
            return time.time() - t0

        tp1 = run_prod(max(1, iters // 4))
        tp2 = run_prod(iters + max(1, iters // 4))
        dtp = (tp2 - tp1) / iters
        mpix_p = w * h / 1e6 / dtp
        log(f"production (mm=default): {dtp * 1e3:.1f} ms/frame -> "
            f"{mpix_p:.1f} Mpix/s")
        print(json.dumps({
            "metric": f"PRODUCTION fwd+bwd Mpix/s/chip (garden, "
                      f"mm_precision=default): {n} gaussians @ {w}x{h}",
            "value": round(mpix_p, 2),
            "unit": "Mpix/s",
            "vs_baseline": round(mpix_p / baseline, 3),
        }))

    # Viewer-mode line (the reference's actual product — forward-only
    # interactive rendering, src/Renderer.cpp:428-450): measured in the
    # same artifact so no headline number lives only in README prose.
    if conf == "garden" and not fwd_only:
        @jax.jit
        def step_fwd(tr):
            img, aux = render_stages(merge_trainable(tr, alive), cam, cfg)
            return jnp.sum(img), aux["num_instances"], aux["capacity_overflow"]

        t0 = time.time()
        _ = float(step_fwd(trainable)[0])
        log(f"viewer-mode compile+first run: {time.time() - t0:.1f}s")

        def run_fwd(k):
            t0 = time.time()
            o = None
            for _ in range(k):
                o = step_fwd(trainable)
            _ = float(o[0])
            return time.time() - t0

        tf1 = run_fwd(max(1, iters // 4))
        tf2 = run_fwd(iters + max(1, iters // 4))
        dtf = (tf2 - tf1) / iters
        mpix_f = w * h / 1e6 / dtf
        log(f"viewer (fwd-only): {dtf * 1e3:.1f} ms/frame -> "
            f"{mpix_f:.1f} Mpix/s ({1.0 / dtf:.1f} fps)")
        print(json.dumps({
            "metric": f"VIEWER fwd-only Mpix/s/chip (garden: {n} gaussians "
                      f"@ {w}x{h})",
            "value": round(mpix_f, 2),
            "unit": "Mpix/s",
            "vs_baseline": round(mpix_f / baseline, 3),
        }))

    # Strip-mode line (the per-chip unit of the v5e-8 target): measured
    # per-strip fwd+bwd through the production dense-exchange pipeline
    # (strip compaction on; ICI modeled from exact byte volumes as in
    # bench/strip_bench and docs/SCALING.md).
    if (conf == "garden" and not fwd_only
            and jax.default_backend() == "tpu"
            and os.environ.get("BENCH_STRIP", "1") != "0"):
        from tpusplat.bench.strip_projection import measure_strip_projection

        sp = measure_strip_projection(params, cam, cfg, shards=8,
                                      iters=max(3, iters // 2),
                                      t_full_ms=dt * 1e3)
        log(f"strip mode: per-strip fwd+bwd max {sp['strip_ms_max']:.1f} ms "
            f"-> v5e-8 projection {sp['mpix_per_s']:.1f} Mpix/s "
            f"({sp['scaling_eff_vs_1chip'] * 100:.0f}% efficiency, "
            "ICI @50%)")
        log(f"strip detail: {sp}")
        print(json.dumps({
            "metric": "STRIP v5e-8 projection Mpix/s (garden, measured "
                      "per-strip fwd+bwd, dense grad exchange, ICI@50%)",
            "value": round(sp["mpix_per_s"], 2),
            "unit": "Mpix/s",
            "vs_baseline": round(sp["mpix_per_s"] / baseline, 3),
        }))

    print(json.dumps({
        "metric": f"{mode} Mpix/s/chip ({conf}: {n} gaussians @ {w}x{h})",
        "value": round(mpix, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix / baseline, 3),
    }))


if __name__ == "__main__":
    main()
