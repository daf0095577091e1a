"""Core pytrees: Gaussian parameters and cameras.

Unlike the reference, which applies activations at load time and stores
activated values on the GPU (``src/GSScene.cpp:44-45``: ``exp(scale)``,
``sigmoid(opacity)``, ``normalize(rotation)``), we keep *raw* parameters in
the pytree so they remain trainable, and apply activations in-graph
(:mod:`tpusplat.ops.activations`). This is the standard JAX arrangement —
parameters are leaves of a pytree fed to ``jax.grad``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianParams:
    """Raw (pre-activation) Gaussian-splat parameters.

    Shapes (N = number of Gaussians):
      means:      [N, 3]    world-space positions
      log_scales: [N, 3]    log of per-axis scales (activation: exp)
      quats:      [N, 4]    rotation quaternion in (w, x, y, z) order as
                            stored in the PLY (``common.glsl:51-55`` remaps
                            the stored vec4 the same way); unnormalized,
                            activation: normalize
      opacities:  [N]       raw opacity logits (activation: sigmoid)
      sh:         [N, 16, 3] spherical-harmonics coefficients, interleaved
                            RGB per coefficient (the reference's GPU layout
                            after the load-time interleave,
                            ``src/GSScene.cpp:47-55``)

    A trailing "alive" mask supports static-capacity training (densify and
    prune fill or free slots without reshaping; dead slots render as fully
    transparent).
    """

    means: jax.Array
    log_scales: jax.Array
    quats: jax.Array
    opacities: jax.Array
    sh: jax.Array
    alive: jax.Array  # [N] bool

    @property
    def num_gaussians(self) -> int:
        return self.means.shape[0]

    @classmethod
    def create(
        cls,
        means,
        log_scales,
        quats,
        opacities,
        sh,
        alive=None,
        dtype=jnp.float32,
    ) -> "GaussianParams":
        means = jnp.asarray(means, dtype)
        n = means.shape[0]
        if alive is None:
            alive = jnp.ones((n,), dtype=bool)
        sh = jnp.asarray(sh, dtype)
        if sh.ndim == 2:  # [N, 48] flat interleaved -> [N, 16, 3]
            sh = sh.reshape(n, 16, 3)
        return cls(
            means=means,
            log_scales=jnp.asarray(log_scales, dtype),
            quats=jnp.asarray(quats, dtype),
            opacities=jnp.asarray(opacities, dtype).reshape(n),
            sh=sh,
            alive=jnp.asarray(alive, bool),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Camera:
    """A camera in the shader convention of the reference.

    ``view`` and ``proj`` are the matrices the reference uploads to the
    ``Params`` uniform block (``src/Renderer.cpp:719-754``): ``view`` is
    ``inverse(translate(pos) * mat4(rot))`` with rows 1 and 2 negated, and
    ``proj`` is ``glm::perspective(...) * view_unflipped`` with row 1 negated.
    Construct via :func:`tpusplat.camera.make_camera` to reproduce that math
    exactly; ``from_matrices`` accepts externally supplied matrices (e.g.
    COLMAP world-to-camera) for training datasets.

    ``width``/``height`` are static metadata (they determine array shapes).
    """

    view: jax.Array  # [4, 4]
    proj: jax.Array  # [4, 4]
    cam_pos: jax.Array  # [3]
    tan_fovx: jax.Array  # scalar
    tan_fovy: jax.Array  # scalar
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def from_matrices(
        cls, view, proj, cam_pos, tan_fovx, tan_fovy, width: int, height: int
    ) -> "Camera":
        f32 = jnp.float32
        return cls(
            view=jnp.asarray(view, f32),
            proj=jnp.asarray(proj, f32),
            cam_pos=jnp.asarray(cam_pos, f32),
            tan_fovx=jnp.asarray(tan_fovx, f32),
            tan_fovy=jnp.asarray(tan_fovy, f32),
            width=int(width),
            height=int(height),
        )


def stack_cameras(cameras: list[Camera]) -> Camera:
    """Stack same-resolution cameras into a batched Camera (leading axis)."""
    w, h = cameras[0].width, cameras[0].height
    assert all(c.width == w and c.height == h for c in cameras)
    return Camera(
        view=jnp.stack([c.view for c in cameras]),
        proj=jnp.stack([c.proj for c in cameras]),
        cam_pos=jnp.stack([c.cam_pos for c in cameras]),
        tan_fovx=jnp.stack([c.tan_fovx for c in cameras]),
        tan_fovy=jnp.stack([c.tan_fovy for c in cameras]),
        width=w,
        height=h,
    )


def to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)
