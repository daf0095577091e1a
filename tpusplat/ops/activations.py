"""In-graph parameter activations.

The reference applies these once at scene load (``src/GSScene.cpp:44-45``):
``scale = exp(raw)``, ``opacity = sigmoid(raw)``, ``rotation = normalize(q)``.
We keep them in-graph so gradients flow to the raw parameters, matching the
original 3DGS training formulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def activate_scales(log_scales: jax.Array, modifier: float = 1.0) -> jax.Array:
    s = jnp.exp(log_scales)
    return s * modifier if modifier != 1.0 else s


def activate_opacity(raw: jax.Array) -> jax.Array:
    return jax.nn.sigmoid(raw)


def normalize_quat(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    return q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)
