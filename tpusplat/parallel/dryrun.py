"""Multi-chip dryrun: jit + execute one full sharded training step on an
n-device mesh with tiny shapes. Invoked by the driver via
``__graft_entry__.dryrun_multichip`` on a virtual CPU mesh."""

from __future__ import annotations

import numpy as np


def run_dryrun(n_devices: int) -> None:
    import jax
    import jax.numpy as jnp

    from tpusplat.camera import look_at_camera
    from tpusplat.config import RenderConfig
    from tpusplat.io.synthetic import random_scene
    from tpusplat.parallel.mesh import make_render_mesh
    from tpusplat.parallel.sharded import (
        params_sharding,
        sharded_train_step,
    )
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
    cfg = RenderConfig(
        sh_degree=1, max_per_tile=128, tile_chunk=4, gauss_chunk=16, capacity_mult=16
    )
    cams = stack_cameras(
        [
            look_at_camera([np.sin(i), 0.3, 5.0], [0, 0, 0], width, height, fov_deg=60.0)
            for i in range(batch)
        ]
    )
    rng = np.random.default_rng(0)
    targets = jnp.asarray(rng.uniform(0, 1, (batch, height, width, 3)), jnp.float32)

    optimizer = make_optimizer()
    state = create_train_state(params, optimizer)
    # Place params according to the mesh sharding.
    pshard = params_sharding(mesh)
    state = dataclasses_replace_params(state, jax.device_put(state.params, pshard))

    from jax.sharding import NamedSharding, PartitionSpec as P

    cams = jax.device_put(cams, NamedSharding(mesh, P("data")))
    targets = jax.device_put(targets, NamedSharding(mesh, P("data", None, None, None)))

    state, metrics = sharded_train_step(state, cams, targets, cfg, optimizer, mesh)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"dryrun loss not finite: {loss}"
    print(f"dryrun_multichip({n_devices}): mesh=({data}x{tile}) loss={loss:.4f} OK")


def dataclasses_replace_params(state, params):
    import dataclasses

    return dataclasses.replace(state, params=params)
