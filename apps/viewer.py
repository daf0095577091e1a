"""CLI renderer — the headless analogue of the reference viewer app
(``apps/viewer/main.cpp:9-107``).

The reference opens a GLFW window and runs an interactive loop; on TPU the
equivalent embedding contract is load-scene + repeated ``render`` calls
(SURVEY.md §3.4: the API serves both self-driving and externally-driven
loops). This app renders one or more cameras to PNG/NPY files and reports
per-stage timings (the GUI metrics overlay, §5, becomes stderr/JSON output).

Flags mirror the reference CLI where meaningful (scene path, width/height,
verbose); env vars use the TPUSPLAT_ prefix like the reference's VKGS_.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import os
import sys
import time


def save_png(path, img):
    from tpusplat.io.dataset import save_png as _save

    _save(path, img)


def main(argv=None):
    p = argparse.ArgumentParser("tpusplat-viewer", description=__doc__)
    p.add_argument("scene", help="path to .ply scene (or 'test' for synthetic)")
    p.add_argument("-w", "--width", type=int,
                   default=int(os.environ.get("TPUSPLAT_WIDTH", 1280)))
    p.add_argument("--height", type=int,
                   default=int(os.environ.get("TPUSPLAT_HEIGHT", 720)))
    p.add_argument("-o", "--output", default="render.png")
    p.add_argument("--camera", type=float, nargs=3, default=[0.0, 0.0, 5.0],
                   metavar=("X", "Y", "Z"), help="camera position")
    p.add_argument("--target", type=float, nargs=3, default=[0.0, 0.0, 0.0])
    p.add_argument("--fov", type=float, default=45.0)
    p.add_argument("--sh-degree", type=int, default=3)
    p.add_argument("--orbit", type=int, default=0,
                   help="render N orbit frames around the target")
    p.add_argument("--xla", action="store_true", help="use the XLA rasterizer")
    p.add_argument("--mesh", default=None,
                   help="'DATAxTILE' device mesh: render frames through the "
                        "tile-sharded multi-chip pipeline (Gaussians + image "
                        "tile-rows over TILE shards; parallel/sharded.py)")
    p.add_argument("-i", "--interactive", action="store_true",
                   help="keyboard-driven terminal loop (wasd/ec move, arrows "
                        "look, q quit) with live metrics")
    p.add_argument("--cols", type=int, default=96,
                   help="interactive terminal preview width in characters")
    p.add_argument("-v", "--verbose", action="store_true")
    args = p.parse_args(argv)
    if args.mesh and args.interactive:
        p.error("--mesh is not supported with --interactive (the terminal "
                "loop drives the single-device Session); drop one of them")

    import numpy as np

    from tpusplat import RenderConfig, load_ply, random_scene, render_auto
    from tpusplat.camera import look_at_camera

    t0 = time.time()
    if args.scene == "test":
        params = random_scene(10_000, seed=0, sh_degree=args.sh_degree)
    else:
        params = load_ply(args.scene)
    print(f"loaded {params.num_gaussians} gaussians in "
          f"{(time.time() - t0) * 1e3:.0f} ms", file=sys.stderr)

    # Env layer under the CLI: TPUSPLAT_* (the VKGS_ analogue), then explicit
    # flags overlay (CLI > env > defaults, apps/viewer/main.cpp:46-50).
    cfg = RenderConfig().with_env_overrides()
    import dataclasses as _dc

    cfg = _dc.replace(cfg, sh_degree=args.sh_degree)
    if args.xla:
        cfg = _dc.replace(cfg, use_pallas=False)
    elif "TPUSPLAT_USE_PALLAS" not in os.environ:
        cfg = _dc.replace(cfg, use_pallas=True)

    if args.interactive:
        import dataclasses as _dc2

        from tpusplat.interactive import run_interactive
        from tpusplat.session import Session, SessionConfig

        sess = Session(
            SessionConfig(width=args.width, height=args.height, fov=args.fov,
                          render=_dc2.replace(cfg, tight_radius=True)),
            params=params,
        )
        sess.position = np.asarray(args.camera, np.float64)
        stats = run_interactive(sess, cols=args.cols)
        print(json.dumps(dict(frames=stats["frames"],
                              seconds=round(stats["seconds"], 2),
                              ema_ms=round(stats["ema_ms"] or 0.0, 1))),
              file=sys.stderr)
        return

    mesh = None
    if args.mesh:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tpusplat.parallel.mesh import make_render_mesh
        from tpusplat.parallel.sharded import params_sharding, render_sharded
        from tpusplat.types import stack_cameras

        d_sz, t_sz = (int(x) for x in args.mesh.lower().split("x"))
        mesh = make_render_mesh(data=d_sz, tile=t_sz)
        n = params.num_gaussians
        if n % t_sz:  # pad with dead slots so Gaussian shards are even
            import jax.numpy as jnp

            pad = t_sz - n % t_sz
            params = jax.tree_util.tree_map(
                lambda x: jnp.concatenate(
                    [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
                if hasattr(x, "shape") and x.shape and x.shape[0] == n
                else x, params)
        params = jax.device_put(params, params_sharding(mesh))
        render_sh = jax.jit(render_sharded, static_argnames=("cfg", "mesh"))

    frames = max(args.orbit, 1)
    center = np.asarray(args.target)
    eye0 = np.asarray(args.camera)
    radius_vec = eye0 - center
    for i in range(frames):
        if args.orbit:
            ang = 2 * np.pi * i / frames
            rot = np.array([
                [np.cos(ang), 0, np.sin(ang)],
                [0, 1, 0],
                [-np.sin(ang), 0, np.cos(ang)],
            ])
            eye = center + rot @ radius_vec
        else:
            eye = eye0
        cam = look_at_camera(eye, center, args.width, args.height, fov_deg=args.fov)
        t0 = time.time()
        if mesh is None:
            img, aux, cfg = render_auto(params, cam, cfg)
            img.block_until_ready()
            msg_extra = dict(instances=int(aux["num_instances"]),
                             overflow=int(aux["capacity_overflow"]))
        else:
            # A "batch" of DATA copies of this camera keeps the mesh fully
            # occupied for a single-frame render. Overflow recovery matches
            # render_auto's contract (never save a silently truncated
            # frame): regrow the channel that overflowed and retry.
            cams_b = stack_cameras([cam] * mesh.shape["data"])
            cams_b = jax.device_put(cams_b, NamedSharding(mesh, P("data")))
            from tpusplat.config import regrow as _regrow

            for _ in range(4):
                imgs, counters = render_sh(params, cams_b, cfg, mesh)
                msg_extra = {k: int(np.sum(np.asarray(v)))
                             for k, v in counters.items()}
                # Shared per-channel recovery (config.regrow, the
                # render_auto contract: never save a truncated frame).
                cfg2, changes = _regrow(
                    cfg, counters,
                    params.num_gaussians // mesh.shape["tile"])
                if changes is None:
                    break
                cfg = cfg2
                print(json.dumps(dict(regrow=True, **changes)),
                      file=sys.stderr)
            else:
                import warnings
                warnings.warn("sharded render still truncated after "
                              f"regrows: {msg_extra}", RuntimeWarning)
            img = np.asarray(imgs[0])
            aux = None
        dt = time.time() - t0
        out = args.output if frames == 1 else args.output.replace(
            ".png", f"_{i:04d}.png")
        save_png(out, img)
        msg = dict(frame=i, ms=round(dt * 1e3, 1), out=out, **msg_extra)
        print(json.dumps(msg), file=sys.stderr)
        if args.verbose and aux is not None:
            print(f"transmittance mean {float(np.mean(aux['transmittance'])):.3f}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
