"""Multi-chip dryrun: jit + execute one full sharded training step on an
n-device mesh with tiny shapes. Invoked by the driver via
``__graft_entry__.dryrun_multichip`` on a virtual CPU mesh.

Certifies the PRODUCTION path: the Pallas rasterizer (interpret mode on the
CPU mesh, compiled on real chips) runs under shard_map, and the sharded
render is asserted equal to the single-device render — not merely a finite
loss. An XLA-rasterizer variant runs too, so both backends' sharding stays
validated.
"""

from __future__ import annotations

import numpy as np


def run_dryrun(n_devices: int) -> None:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tpusplat.camera import look_at_camera
    from tpusplat.config import RenderConfig
    from tpusplat.io.synthetic import random_scene
    from tpusplat.parallel.mesh import make_render_mesh
    from tpusplat.parallel.sharded import (
        params_sharding,
        render_sharded,
        sharded_train_step,
        sharded_train_step_overlap,
    )
    from tpusplat.render import render_stages
    from tpusplat.train.step import create_train_state, make_optimizer
    from tpusplat.types import stack_cameras

    devices = jax.devices()[:n_devices]
    data = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    tile = n_devices // data
    mesh = make_render_mesh(data=data, tile=tile, devices=devices)

    n_gauss = 128 * tile  # even shard
    width, height = 64, 16 * tile * 1  # one tile row per shard
    batch = data

    params = random_scene(n_gauss, seed=0, sh_degree=1, scale_range=(0.1, 0.5))
    base_cfg = RenderConfig(
        sh_degree=1, max_per_tile=2048, tile_chunk=4, gauss_chunk=16, capacity_mult=16
    )
    cams = stack_cameras(
        [
            look_at_camera([np.sin(i), 0.3, 5.0], [0, 0, 0], width, height, fov_deg=60.0)
            for i in range(batch)
        ]
    )
    rng = np.random.default_rng(0)
    targets = jnp.asarray(rng.uniform(0, 1, (batch, height, width, 3)), jnp.float32)

    from jax.sharding import NamedSharding, PartitionSpec as P

    pshard = params_sharding(mesh)
    cams_sh = jax.device_put(cams, NamedSharding(mesh, P("data")))
    targets_sh = jax.device_put(
        targets, NamedSharding(mesh, P("data", None, None, None))
    )

    for backend in ("pallas", "xla"):
        cfg = dataclasses.replace(base_cfg, use_pallas=(backend == "pallas"))

        # 1. Sharded render equals the single-device render (the correctness
        #    keystone — certifies the collective layout, not just liveness).
        img_sh, counters = jax.jit(
            render_sharded, static_argnames=("cfg", "mesh")
        )(jax.device_put(params, pshard), cams_sh, cfg, mesh)
        img_sh = np.asarray(img_sh)
        for name, v in counters.items():
            assert int(np.asarray(v).sum()) == 0, f"{name} in dryrun"
        for b in range(batch):
            cam_b = jax.tree_util.tree_map(lambda x: x[b], cams)
            ref, _ = render_stages(params, cam_b, cfg)
            np.testing.assert_allclose(
                img_sh[b], np.asarray(ref), atol=1e-5, rtol=1e-4,
                err_msg=f"{backend}: sharded != single-device (camera {b})",
            )

        # 2. One full sharded training step executes with a finite loss.
        optimizer = make_optimizer()
        state = create_train_state(params, optimizer)
        state = dataclasses.replace(
            state, params=jax.device_put(state.params, pshard)
        )
        state, metrics = sharded_train_step(
            state, cams_sh, targets_sh, cfg, optimizer, mesh
        )
        loss = float(metrics["loss"])
        assert np.isfinite(loss), f"{backend}: dryrun loss not finite: {loss}"

        # 3. The OVERLAP step (halo-exchange strip loss + ppermute ring grad
        #    reduce — the path the v5e-8 scaling claim rests on) compiles,
        #    executes, and matches the monolithic step's loss.
        state2 = create_train_state(params, optimizer)
        state2 = dataclasses.replace(
            state2, params=jax.device_put(state2.params, pshard)
        )
        state2, metrics2 = sharded_train_step_overlap(
            state2, cams_sh, targets_sh, cfg, optimizer, mesh
        )
        loss_ov = float(metrics2["loss"])
        assert np.isfinite(loss_ov), f"{backend}: overlap loss not finite"
        assert abs(loss_ov - loss) <= 1e-4 * max(1.0, abs(loss)), (
            f"{backend}: overlap step loss {loss_ov} != monolithic {loss}"
        )
        print(
            f"dryrun_multichip({n_devices}): mesh=({data}x{tile}) "
            f"backend={backend} loss={loss:.4f} overlap_loss={loss_ov:.4f} "
            "image-equality OK"
        )

    # 4. Compact-gradient all-to-all exchange (parallel/compact_grad.py):
    #    needs a scene where strip compaction activates (gauss cap < N
    #    after its 1024-slot rounding), so a taller frame + larger N than
    #    the blocks above. Certify step equality against the dense
    #    psum-scatter exchange on the same mesh.
    n_gauss = 4096
    height = 16 * 4 * tile  # 4 tile rows per shard
    cfg_c = dataclasses.replace(base_cfg, use_pallas=True,
                                strip_gauss_mult=1.5)
    tiles_y = cfg_c.tile_grid(width, height)[1]
    assert cfg_c.strip_gauss_capacity(
        n_gauss, -(-tiles_y // tile), tiles_y) is not None, (
        "dryrun compact block no longer activates compaction")
    params_c = random_scene(n_gauss, seed=1, sh_degree=1,
                            scale_range=(0.1, 0.5))
    cams_c = stack_cameras(
        [
            look_at_camera([np.sin(i), 0.3, 5.0], [0, 0, 0], width, height,
                           fov_deg=60.0)
            for i in range(batch)
        ]
    )
    targets_c = jnp.asarray(
        rng.uniform(0, 1, (batch, height, width, 3)), jnp.float32)
    cams_csh = jax.device_put(cams_c, NamedSharding(mesh, P("data")))
    targets_csh = jax.device_put(
        targets_c, NamedSharding(mesh, P("data", None, None, None)))

    losses = {}
    opt_c = make_optimizer()
    for mode in ("compact", "dense"):
        cfg_m = dataclasses.replace(cfg_c, grad_exchange=mode)
        st = create_train_state(params_c, opt_c)
        st = dataclasses.replace(st, params=jax.device_put(st.params, pshard))
        st, mm = sharded_train_step(
            st, cams_csh, targets_csh, cfg_m, opt_c, mesh)
        for name in ("capacity_overflow", "gauss_overflow", "a2a_overflow"):
            assert int(np.asarray(mm[name]).sum()) == 0, f"{mode}: {name}"
        assert int(st.step) == 1, f"{mode}: step gated"
        losses[mode] = (float(mm["loss"]), np.asarray(st.params.means))
    assert abs(losses["compact"][0] - losses["dense"][0]) <= 1e-5 * max(
        1.0, abs(losses["dense"][0]))
    np.testing.assert_allclose(
        losses["compact"][1], losses["dense"][1], atol=3e-6,
        err_msg="compact-gradient exchange != dense exchange")
    print(
        f"dryrun_multichip({n_devices}): compact-gradient all_to_all "
        f"exchange == dense psum-scatter (loss {losses['compact'][0]:.4f})"
    )
