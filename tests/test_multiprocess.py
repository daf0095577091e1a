"""Real multi-PROCESS execution of the sharded training step.

Launches 2 OS processes, each with 4 virtual CPU devices, that join one
jax.distributed cluster through ``parallel.mesh.multihost_initialize`` (the
BASELINE config-5 bring-up path) and run BOTH ``sharded_train_step`` and
``sharded_train_step_overlap`` (halo-exchange strip loss + ppermute ring,
the path the 2-host scaling claim rests on) over the resulting 8-device
(2x4) global mesh. Process 0 asserts each distributed loss matches the
single-process monolithic reference — so the multi-host code path is
EXECUTED, not merely defined. Uses the gloo/CPU backend; on a pod the same
calls ride ICI (parallel/mesh.py docstring).
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

_WORKER = textwrap.dedent("""
    import json, os, sys

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
    import jax
    jax.config.update("jax_platforms", "cpu")

    coord = sys.argv[1]
    pid = int(sys.argv[2])

    from tpusplat.parallel.mesh import make_render_mesh, multihost_initialize

    multihost_initialize(
        coordinator_address=coord,
        num_processes=2,
        process_id=pid,
        cluster_detection_method="deactivate",
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpusplat.camera import look_at_camera
    from tpusplat.config import RenderConfig
    from tpusplat.io.synthetic import random_scene
    from tpusplat.parallel.sharded import (
        params_sharding, sharded_train_step, sharded_train_step_overlap,
    )
    from tpusplat.train.step import create_train_state, make_optimizer
    from tpusplat.types import stack_cameras

    mesh = make_render_mesh(data=2, tile=4)
    n_gauss, width, height, batch = 512, 64, 64, 2
    params = random_scene(n_gauss, seed=0, sh_degree=1, scale_range=(0.1, 0.5))
    cfg = RenderConfig(sh_degree=1, max_per_tile=2048, tile_chunk=4,
                       gauss_chunk=16, capacity_mult=16)
    cams = stack_cameras([
        look_at_camera([np.sin(i), 0.3, 5.0], [0, 0, 0], width, height,
                       fov_deg=60.0)
        for i in range(batch)
    ])
    rng = np.random.default_rng(0)
    targets = jnp.asarray(rng.uniform(0, 1, (batch, height, width, 3)),
                          jnp.float32)

    # Globally-sharded inputs: every process passes the same global value.
    def put(x, spec):
        return jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, spec),
            lambda idx: np.asarray(x)[idx])

    pshard = params_sharding(mesh)
    params_g = jax.tree_util.tree_map(
        lambda x, s: put(x, s.spec), params, pshard)
    cams_g = jax.tree_util.tree_map(
        lambda x: put(x, P("data", *([None] * (x.ndim - 1)))),
        (cams.view, cams.proj, cams.cam_pos, cams.tan_fovx, cams.tan_fovy))
    from tpusplat.types import Camera
    cams_sh = Camera(view=cams_g[0], proj=cams_g[1], cam_pos=cams_g[2],
                     tan_fovx=cams_g[3], tan_fovy=cams_g[4],
                     width=width, height=height)
    targets_sh = put(targets, P("data", None, None, None))

    optimizer = make_optimizer()
    state = create_train_state(params_g, optimizer)
    state, metrics = sharded_train_step(
        state, cams_sh, targets_sh, cfg, optimizer, mesh)
    # Reduce to replicated scalars before fetching: the raw outputs span
    # devices this process cannot address.
    loss = float(jax.device_get(jax.jit(jnp.mean)(metrics["loss"])))
    ovf = int(jax.device_get(jax.jit(jnp.sum)(metrics["capacity_overflow"])))

    # The OVERLAP step (halo-exchange strip loss + explicit ppermute ring
    # grad reduce) — the exact path the >=85% 2-host scaling claim rests
    # on — must also cross a real process boundary, from a fresh state.
    state_o = create_train_state(
        jax.tree_util.tree_map(lambda x, s: put(np.asarray(x), s.spec),
                               params, pshard),
        optimizer)
    state_o, metrics_o = sharded_train_step_overlap(
        state_o, cams_sh, targets_sh, cfg, optimizer, mesh,
        grad_reduce="ring")
    loss_ring = float(jax.device_get(jax.jit(jnp.mean)(metrics_o["loss"])))
    ovf_ring = int(jax.device_get(
        jax.jit(jnp.sum)(metrics_o["capacity_overflow"])))

    # The COMPACT gradient exchange (owner-bucketed lax.all_to_all,
    # parallel/compact_grad.py) must also cross a real process boundary.
    # Needs a scene where strip compaction activates (gauss cap < N after
    # its 1024-slot rounding): 4096 Gaussians, 16 tile rows over 4 shards.
    wc, hc = 64, 256
    params_c = random_scene(4096, seed=2, sh_degree=1,
                            scale_range=(0.05, 0.3))
    cfg_c = dataclasses.replace(cfg, use_pallas=True, strip_gauss_mult=1.5,
                                grad_exchange="compact")
    cams_c = stack_cameras([
        look_at_camera([np.sin(i), 0.3, 5.0], [0, 0, 0], wc, hc,
                       fov_deg=60.0)
        for i in range(batch)
    ])
    tgt_c = np.random.default_rng(1).uniform(
        0, 1, (batch, hc, wc, 3)).astype(np.float32)
    params_cg = jax.tree_util.tree_map(
        lambda x, s: put(np.asarray(x), s.spec), params_c, pshard)
    cg = jax.tree_util.tree_map(
        lambda x: put(np.asarray(x), P("data", *([None] * (x.ndim - 1)))),
        (cams_c.view, cams_c.proj, cams_c.cam_pos, cams_c.tan_fovx,
         cams_c.tan_fovy))
    cams_cs = Camera(view=cg[0], proj=cg[1], cam_pos=cg[2], tan_fovx=cg[3],
                     tan_fovy=cg[4], width=wc, height=hc)
    tgt_cs = put(jnp.asarray(tgt_c), P("data", None, None, None))
    state_c = create_train_state(params_cg, optimizer)
    state_c, metrics_c = sharded_train_step(
        state_c, cams_cs, tgt_cs, cfg_c, optimizer, mesh)
    loss_compact = float(jax.device_get(jax.jit(jnp.mean)(metrics_c["loss"])))
    a2a_ovf = int(jax.device_get(
        jax.jit(jnp.sum)(metrics_c["a2a_overflow"])))
    if pid == 0:
        print(json.dumps({"loss": loss, "overflow": ovf,
                          "loss_ring": loss_ring, "overflow_ring": ovf_ring,
                          "loss_compact": loss_compact, "a2a_ovf": a2a_ovf,
                          "processes": jax.process_count()}))
""")


def test_two_process_gloo_sharded_step(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=840) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{se[-3000:]}"

    result = json.loads(outs[0][0].strip().splitlines()[-1])
    assert result["processes"] == 2
    assert result["overflow"] == 0
    assert np.isfinite(result["loss"])
    assert result["overflow_ring"] == 0
    assert np.isfinite(result["loss_ring"])

    # Single-process (8 virtual devices, same mesh shape) reference.
    import dataclasses  # noqa: F401

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpusplat.camera import look_at_camera
    from tpusplat.config import RenderConfig
    from tpusplat.io.synthetic import random_scene
    from tpusplat.parallel.mesh import make_render_mesh
    from tpusplat.parallel.sharded import params_sharding, sharded_train_step
    from tpusplat.train.step import create_train_state, make_optimizer
    from tpusplat.types import stack_cameras

    mesh = make_render_mesh(data=2, tile=4)
    params = random_scene(512, seed=0, sh_degree=1, scale_range=(0.1, 0.5))
    cfg = RenderConfig(sh_degree=1, max_per_tile=2048, tile_chunk=4,
                       gauss_chunk=16, capacity_mult=16)
    cams = stack_cameras([
        look_at_camera([np.sin(i), 0.3, 5.0], [0, 0, 0], 64, 64, fov_deg=60.0)
        for i in range(2)
    ])
    rng = np.random.default_rng(0)
    targets = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    params_sh = jax.device_put(params, params_sharding(mesh))
    cams_sh = jax.device_put(cams, NamedSharding(mesh, P("data")))
    targets_sh = jax.device_put(
        targets, NamedSharding(mesh, P("data", None, None, None)))
    optimizer = make_optimizer()
    state = create_train_state(params_sh, optimizer)
    _, metrics = sharded_train_step(
        state, cams_sh, targets_sh, cfg, optimizer, mesh)
    ref_loss = float(metrics["loss"])

    assert abs(result["loss"] - ref_loss) <= 1e-5 * max(1.0, abs(ref_loss)), (
        f"2-process loss {result['loss']} != single-process {ref_loss}"
    )
    # Overlap-step loss across the REAL process boundary equals the
    # monolithic single-process reference (same contract test_collectives
    # certifies on one process: equality up to fp reassociation of the
    # ring/halo reductions).
    assert abs(result["loss_ring"] - ref_loss) \
        <= 1e-5 * max(1.0, abs(ref_loss)), (
        f"2-process overlap(ring) loss {result['loss_ring']} != "
        f"single-process monolithic {ref_loss}"
    )

    # Compact-exchange step across the process boundary: its all_to_all
    # executed (no deadlock, no bucket overflow) and its loss equals the
    # single-process dense-exchange reference on the same scene (the
    # forward paths are numerically identical; gradient-path equality is
    # certified by tests/test_compact_grad.py and the hardware gate).
    assert result["a2a_ovf"] == 0
    import dataclasses as dc

    from tpusplat.types import stack_cameras as _sc

    params_c = random_scene(4096, seed=2, sh_degree=1,
                            scale_range=(0.05, 0.3))
    cfg_c = dc.replace(cfg, use_pallas=True, strip_gauss_mult=1.5,
                       grad_exchange="dense")
    wc, hc = 64, 256
    cams_c = _sc([
        look_at_camera([np.sin(i), 0.3, 5.0], [0, 0, 0], wc, hc,
                       fov_deg=60.0)
        for i in range(2)
    ])
    tgt_c = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (2, hc, wc, 3)), jnp.float32)
    state_c = create_train_state(
        jax.device_put(params_c, params_sharding(mesh)), optimizer)
    _, m_c = sharded_train_step(
        state_c,
        jax.device_put(cams_c, NamedSharding(mesh, P("data"))),
        jax.device_put(tgt_c, NamedSharding(mesh, P("data", None, None, None))),
        cfg_c, optimizer, mesh)
    ref_loss_c = float(m_c["loss"])
    assert abs(result["loss_compact"] - ref_loss_c) \
        <= 1e-5 * max(1.0, abs(ref_loss_c)), (
        f"2-process compact-exchange loss {result['loss_compact']} != "
        f"single-process dense {ref_loss_c}"
    )
