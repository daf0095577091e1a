"""Device mesh construction.

The reference has no multi-device support of any kind (SURVEY.md §2.4); this
is the communication layer it lacks, built on JAX meshes and XLA collectives
over ICI/DCN rather than NCCL/MPI.

Mesh axes:
  * ``data``  — camera batch (data parallelism); gradients psum over it.
  * ``tile``  — joint Gaussian/tile sharding: Gaussians are sharded over
    this axis during preprocess, their compact screen-space attributes are
    all-gathered over ICI, and image tile-rows are sharded over the same
    axis for binning + rasterization (the renderer analogue of
    sequence parallelism: shard the output domain, exchange the inputs).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_render_mesh(data: int = 1, tile: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if tile is None:
        tile = len(devices) // data
    if data * tile != len(devices):
        devices = devices[: data * tile]
    arr = np.asarray(devices).reshape(data, tile)
    return Mesh(arr, ("data", "tile"))


def multihost_initialize(**kwargs) -> None:
    """Multi-host bring-up (config 5): ``jax.distributed.initialize``.

    On a pod slice each host calls this before building the mesh; the
    ``data``/``tile`` axes then span all hosts' devices, with tile-axis
    collectives riding ICI within a slice and gradient psum crossing DCN
    only when the data axis spans hosts.
    """
    jax.distributed.initialize(**kwargs)
