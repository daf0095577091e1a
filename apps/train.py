"""Training driver: optimize a Gaussian scene against target images.

The capability the reference leaves as a TODO (README.md:88 'Training').
Supports synthetic self-supervision (fit a randomly-initialized model to
renders of a reference scene — useful without datasets) and directories of
(camera, image) pairs saved as .npz.

Usage:
  python apps/train.py --synthetic --steps 500 --out scene.ply
  python apps/train.py --data ds_dir --steps 30000 --out scene.ply
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser("tpusplat-train")
    p.add_argument("--data", default=None, help=".npz dataset dir (cameras+images)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--n-init", type=int, default=5000, help="initial gaussians")
    p.add_argument("--capacity", type=int, default=0,
                   help="slot capacity (0 = 4x n-init)")
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--sh-degree", type=int, default=2)
    p.add_argument("--cameras", type=int, default=16)
    p.add_argument("--densify-every", type=int, default=200)
    p.add_argument("--densify-until", type=int, default=0, help="0 = steps//2")
    p.add_argument("--opacity-reset-every", type=int, default=1500)
    p.add_argument("--holdout", type=int, default=0,
                   help="hold out every Kth view from training for PSNR/SSIM "
                        "eval (K >= 2; 0 = eval on training views)")
    p.add_argument("--eval-every", type=int, default=0,
                   help="log eval PSNR/SSIM every N steps (0 = final only)")
    p.add_argument("--mesh", default=None,
                   help="'DATAxTILE' device mesh for multi-chip sharded "
                        "training (e.g. 2x4): cameras batch over DATA, "
                        "Gaussians + image tile-rows shard over TILE "
                        "(parallel/sharded.py). Requires DATA*TILE devices")
    p.add_argument("--overlap", action="store_true",
                   help="with --mesh: use the comm/compute-overlap step "
                        "(halo-exchange strip loss + ppermute ring)")
    p.add_argument("--out", default="trained.ply")
    p.add_argument("--ckpt", default=None, help="checkpoint path (.npz)")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--xla", action="store_true")
    p.add_argument("--watchdog-secs", type=float, default=0.0,
                   help="stall detector: hard-exit(42) with stack dumps if "
                        "no step completes for this long (0 = off). Must "
                        "exceed the worst-case pipeline compile time: the "
                        "first step and every post-regrow retry recompile")
    args = p.parse_args(argv)
    # Pure argument validation up front — before any dataset load.
    if args.holdout == 1:
        p.error("--holdout must be >= 2 (1 would hold out every view)")
    mesh_dims = None
    if args.mesh:
        try:
            mesh_dims = tuple(int(x) for x in args.mesh.lower().split("x"))
            assert len(mesh_dims) == 2 and min(mesh_dims) >= 1
        except (ValueError, AssertionError):
            p.error("--mesh expects DATAxTILE, e.g. 2x4")

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpusplat.camera import look_at_camera
    from tpusplat.config import RenderConfig
    from tpusplat.io.ply import save_ply
    from tpusplat.io.synthetic import random_scene
    from tpusplat.render import render_stages
    from tpusplat.train.checkpoint import save_checkpoint
    from tpusplat.train.densify import DensifyConfig, densify_and_prune, reset_opacity
    from tpusplat.train.step import create_train_state, make_optimizer, train_step
    from tpusplat.types import GaussianParams

    w, h = args.width, args.height
    cfg = RenderConfig(max_per_tile=2048).with_env_overrides()
    cfg = dataclasses.replace(cfg, sh_degree=args.sh_degree)
    if args.xla:
        cfg = dataclasses.replace(cfg, use_pallas=False)
    elif "TPUSPLAT_USE_PALLAS" not in os.environ:
        cfg = dataclasses.replace(cfg, use_pallas=True)

    # --- data ---
    cams, targets = [], []
    colmap_init = None
    if args.data:
        from tpusplat.io.dataset import (
            is_colmap, is_nerf_synthetic, load_nerf_synthetic, load_views,
            read_image,
        )

        if is_colmap(args.data):
            # COLMAP capture (the standard Mip-NeRF360 layout: sparse/0 +
            # images/); the SfM point cloud seeds the model, the standard
            # 3DGS recipe.
            from tpusplat.io.colmap import load_colmap_scene

            cams, names, colmap_init = load_colmap_scene(args.data)
            imgs = [read_image(os.path.join(args.data, "images", nm))[..., :3]
                    for nm in names]
        elif is_nerf_synthetic(args.data):
            cams, imgs = load_nerf_synthetic(args.data)
        else:
            cams, imgs = load_views(args.data)
        targets = [jnp.asarray(im, jnp.float32) for im in imgs]
        w, h = cams[0].width, cams[0].height
        # Scene extent = 1.1x the camera-position bounding-sphere radius —
        # the standard 3DGS "nerf normalization" that scales the means
        # learning rate and densification thresholds (upstream getNerfppNorm
        # recipe; replaces the cruder position-std heuristic).
        centers = np.stack([np.asarray(c.cam_pos) for c in cams])
        radius = float(np.max(np.linalg.norm(
            centers - centers.mean(axis=0), axis=1)))
        scene_extent = max(radius * 1.1, 1.0)
    else:
        # Self-supervised synthetic: ground-truth scene renders are targets.
        gt = random_scene(8000, seed=42, sh_degree=args.sh_degree,
                          scale_range=(0.05, 0.2))
        rng = np.random.default_rng(0)
        for i in range(args.cameras):
            ang = 2 * np.pi * i / args.cameras
            eye = [6 * np.sin(ang), rng.uniform(-1, 1), 6 * np.cos(ang)]
            cam = look_at_camera(eye, [0, 0, 0], w, h, fov_deg=60.0)
            img, _ = render_stages(gt, cam, cfg)
            cams.append(cam)
            targets.append(img)
        scene_extent = 6.0

    # --- init model ---
    if colmap_init is not None:
        # Seed from the SfM point cloud (upstream 3DGS initialization);
        # dead random slots beyond it leave densification headroom.
        m_pts = colmap_init.num_gaussians
        cap = args.capacity or 4 * m_pts
        if mesh_dims:  # even Gaussian shards over the tile axis
            cap = -(-cap // mesh_dims[1]) * mesh_dims[1]
        m = min(m_pts, cap)
        base = random_scene(cap, seed=1, sh_degree=args.sh_degree,
                            extent=3.0, scale_range=(0.05, 0.25))
        k_sh = int(base.sh.shape[1])

        def seed_first(b, v):
            out = np.asarray(b).copy()
            v = np.asarray(v)
            if out.ndim == 3:  # sh: slice to this run's coefficient count
                out[:m] = v[:m, :k_sh, :]
            else:
                out[:m] = v[:m]
            return jnp.asarray(out)

        alive = np.zeros(cap, bool)
        alive[:m] = True
        init = dataclasses.replace(
            base,
            means=seed_first(base.means, colmap_init.means),
            log_scales=seed_first(base.log_scales, colmap_init.log_scales),
            quats=seed_first(base.quats, colmap_init.quats),
            opacities=seed_first(base.opacities, colmap_init.opacities),
            sh=seed_first(base.sh, colmap_init.sh),
            alive=jnp.asarray(alive),
        )
        print(json.dumps(dict(colmap_points=int(m_pts), seeded=int(m),
                              capacity=cap)), file=sys.stderr, flush=True)
    else:
        cap = args.capacity or 4 * args.n_init
        if mesh_dims:
            cap = -(-cap // mesh_dims[1]) * mesh_dims[1]
        init = random_scene(cap, seed=1, sh_degree=args.sh_degree, extent=3.0,
                            scale_range=(0.05, 0.25))
        alive = np.zeros(cap, bool)
        alive[: args.n_init] = True
        init = dataclasses.replace(init, alive=jnp.asarray(alive))

    # --- held-out eval split (every Kth view, the llffhold convention) ---
    eval_cams, eval_targets = cams, targets
    if args.holdout > 0 and len(cams) > args.holdout:
        hold = set(range(0, len(cams), args.holdout))
        eval_cams = [c for i, c in enumerate(cams) if i in hold]
        eval_targets = [t for i, t in enumerate(targets) if i in hold]
        cams = [c for i, c in enumerate(cams) if i not in hold]
        targets = [t for i, t in enumerate(targets) if i not in hold]

    optimizer = make_optimizer(scene_extent=scene_extent,
                               means_lr_max_steps=args.steps)
    state = create_train_state(init, optimizer)

    # Multi-chip mode: Gaussians + tile-rows shard over 'tile', camera
    # batches over 'data' (parallel/sharded.py); each loop iteration
    # consumes DATA cameras and performs one sharded optimizer step.
    mesh = None
    if mesh_dims:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from tpusplat.parallel.mesh import make_render_mesh
        from tpusplat.parallel.sharded import (
            params_sharding, sharded_train_step, sharded_train_step_overlap,
        )
        from tpusplat.types import stack_cameras

        d_sz, t_sz = mesh_dims
        mesh = make_render_mesh(data=d_sz, tile=t_sz)
        pshard = params_sharding(mesh)
        state = dataclasses.replace(
            state, params=jax.device_put(state.params, pshard))
        shard_step = (sharded_train_step_overlap if args.overlap
                      else sharded_train_step)
        print(json.dumps(dict(mesh=f"{d_sz}x{t_sz}",
                              overlap=bool(args.overlap))),
              file=sys.stderr, flush=True)

    dcfg = DensifyConfig()
    densify_until = args.densify_until or args.steps // 2
    key = jax.random.key(0)
    # Jitted ONCE outside the loop: constructing jax.jit per call would make
    # every densify round pay a fresh trace + compile.
    densify_jit = jax.jit(
        densify_and_prune, static_argnames=("dcfg", "scene_extent"))

    # Exact capacity recovery (the reference's sort-buffer growth + frame
    # retry, src/Renderer.cpp:541-563 with the goto at 383): train_step gates
    # its update in-graph, so an overflowed step is a no-op on the state.
    # The host polls the overflow counter with one step of lag — the
    # device-to-host sync for step k overlaps step k+1's compute, so async
    # dispatch stays pipelined — and re-queues the overflowed camera at a
    # grown capacity. No truncated gradient is ever applied.
    import collections

    t0 = time.time()
    inflight = collections.deque()  # (cam_idx, metrics) awaiting overflow poll
    retry_q = collections.deque()  # cameras to retry after a regrow
    done, seq = 0, 0

    # Stall detection (train/watchdog.py): a hung device call or dead
    # collective becomes a loud exit(42) instead of a silent forever-hang.
    from tpusplat.train.watchdog import Watchdog

    dog = Watchdog(args.watchdog_secs).start() if args.watchdog_secs > 0 \
        else None

    from tpusplat.config import regrow as _regrow

    def poll_oldest():
        nonlocal cfg, done
        i, metrics = inflight.popleft()
        overflow = int(jnp.sum(metrics["capacity_overflow"]))
        if dog is not None:
            dog.beat(done)  # metrics fetch above is the device sync
        # Shared per-channel recovery policy (config.regrow): each
        # truncation channel grows ITS capacity knob — instance capacity
        # on the PER-SHARD Gaussian count (render_sharded sizes buffers
        # per tile shard), gauss-stream / a2a-bucket multipliers, and the
        # XLA path's max_per_tile. The step already no-op'd in-graph.
        shard_g = state.params.num_gaussians // (
            mesh.shape["tile"] if mesh is not None else 1)
        cfg2, changes = _regrow(cfg, metrics, shard_g)
        if changes is not None:
            cfg = cfg2
            retry_q.append(i)
            print(json.dumps(dict(step=done + 1, **changes)),
                  file=sys.stderr, flush=True)
            return
        done += 1
        if done % args.log_every == 0:
            n_alive = int(jnp.sum(state.params.alive))
            print(json.dumps(dict(
                step=done, loss=round(float(metrics["loss"]), 5),
                alive=n_alive, overflow=overflow,
                sps=round(done / (time.time() - t0), 2),
            )), file=sys.stderr, flush=True)

    # Held-out quality eval: PSNR/SSIM on the eval views (quality as a
    # NUMBER, not a loss delta — a regression that still reduces loss, e.g.
    # opacity collapse, shows up here). Reuses the training-shape compiled
    # renderer, so an eval pass costs forward-only frames.
    from tpusplat.render import render_stages as _render_eval
    from tpusplat.train.losses import psnr as _psnr, ssim as _ssim

    def run_eval(step_no, final=False):
        ps, ss = [], []
        for cam_e, tgt_e in zip(eval_cams, eval_targets):
            img, _ = _render_eval(state.params, cam_e, cfg)
            ps.append(float(_psnr(img, tgt_e)))
            ss.append(float(_ssim(img, tgt_e, crop_border=True)))
        print(json.dumps(dict(
            eval_step=step_no, psnr=round(sum(ps) / len(ps), 2),
            ssim=round(sum(ss) / len(ss), 4), views=len(ps),
            holdout=args.holdout > 0, final=final,
        )), file=sys.stderr, flush=True)

    last_densify = last_reset = 0
    last_eval = 0
    if args.eval_every:
        run_eval(0)  # pre-training baseline, so improvement is measurable
    while done < args.steps:
        if retry_q:
            i = retry_q.popleft()
        elif mesh is None:
            i = seq % len(cams)
            seq += 1
        else:
            i = tuple((seq + j) % len(cams) for j in range(mesh.shape["data"]))
            seq += mesh.shape["data"]
        if dog is not None:
            # Mark 'work submitted' BEFORE the dispatch: the first step (and
            # every post-regrow retry) includes a full pipeline compile that
            # can exceed a steady-state timeout; the completion heartbeat in
            # poll_oldest alone would spuriously expire during it.
            dog.beat(done)
        if mesh is None:
            state, metrics = train_step(state, cams[i], targets[i], cfg,
                                        optimizer)
        else:
            camb = stack_cameras([cams[j] for j in i])
            tgtb = jnp.stack([targets[j] for j in i])
            camb = jax.device_put(camb, NamedSharding(mesh, P("data")))
            tgtb = jax.device_put(
                tgtb, NamedSharding(mesh, P("data", None, None, None)))
            state, metrics = shard_step(state, camb, tgtb, cfg, optimizer,
                                        mesh)
        inflight.append((i, metrics))
        if len(inflight) >= 2 or done + len(inflight) >= args.steps:
            poll_oldest()
        step = done
        if args.densify_every and step - last_densify >= args.densify_every \
                and step <= densify_until:
            last_densify = step
            key, sub = jax.random.split(key)
            state = densify_jit(state, sub, dcfg, scene_extent)
            if mesh is not None:  # keep the even Gaussian sharding
                state = dataclasses.replace(
                    state, params=jax.device_put(state.params, pshard))
        if args.opacity_reset_every and step - last_reset >= args.opacity_reset_every \
                and step <= densify_until:
            last_reset = step
            state = reset_opacity(state)
        if args.eval_every and step - last_eval >= args.eval_every:
            last_eval = step
            run_eval(step)
    while inflight:
        poll_oldest()
    if dog is not None:
        dog.stop()
    run_eval(done, final=True)

    save_ply(args.out, state.params)
    print(f"saved {args.out}", file=sys.stderr)
    if args.ckpt:
        save_checkpoint(args.ckpt, state)
        print(f"checkpointed {args.ckpt}", file=sys.stderr)


if __name__ == "__main__":
    main()
