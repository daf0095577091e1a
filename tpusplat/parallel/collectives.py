"""Explicit collectives for comm/compute overlap.

The reference has no distributed layer at all (SURVEY.md §2.4); the north
star requires the gradient all-reduce to overlap the backward blend
(BASELINE.json: >=85% efficiency at 2 hosts). A single monolithic
``lax.psum`` of every gradient at the end of the backward pass serializes
comm after compute; this module provides the overlap-ready alternative:

  * :func:`ring_all_reduce` — a bandwidth-optimal ring all-reduce built
    from ``lax.ppermute`` (reduce-scatter pass + all-gather pass, 2(S-1)
    steps of N/S bytes). Because it is expressed as 2(S-1) *independent
    ppermute steps* instead of one fused psum, XLA's latency-hiding
    scheduler is free to interleave the early steps with whatever compute
    is still in flight — exactly the "chunked psum interleaved with the
    backward strip loop" design, and the same building block the Pallas
    ring-collective pattern uses at kernel level (pallas_guide §18).
  * :func:`allreduce_bytes` — the comm-volume accounting used by
    docs/SCALING.md.

Numerical contract: the ring produces the identical sum to ``lax.psum`` up
to fp reassociation (segments accumulate in ring order rather than
tree order); tests assert allclose at f32 resolution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _ring_all_reduce_flat(x: jax.Array, axis_name: str) -> jax.Array:
    """All-reduce a flat [L] vector over ``axis_name`` with a ppermute ring."""
    s = lax.axis_size(axis_name)
    if s == 1:
        return x
    i = lax.axis_index(axis_name)
    n = x.shape[0]
    seg = -(-n // s)
    xp = jnp.pad(x, (0, seg * s - n)).reshape(s, seg)
    fwd = [(j, (j + 1) % s) for j in range(s)]

    # Reduce-scatter: at step t, send the running segment (i - t) mod s and
    # fold the received one; after S-1 steps this device holds the fully
    # reduced segment (i + 1) mod s.
    def rs_step(t, carry):
        xp, buf = carry
        buf = lax.ppermute(buf, axis_name, fwd)
        idx = (i - t - 1) % s
        buf = buf + lax.dynamic_index_in_dim(xp, idx, keepdims=False)
        return xp, buf

    buf0 = lax.dynamic_index_in_dim(xp, i % s, keepdims=False)
    _, buf = lax.fori_loop(0, s - 1, rs_step, (xp, buf0))

    # All-gather: circulate the reduced segments; device i starts holding
    # segment (i + 1) mod s.
    def ag_step(t, carry):
        out, buf = carry
        idx = (i + 1 - t) % s
        out = lax.dynamic_update_index_in_dim(out, buf, idx, axis=0)
        buf = lax.ppermute(buf, axis_name, fwd)
        return out, buf

    out0 = jnp.zeros_like(xp)
    out, buf = lax.fori_loop(0, s - 1, ag_step, (out0, buf))
    out = lax.dynamic_update_index_in_dim(out, buf, (i + 2 - s) % s, axis=0)
    return out.reshape(-1)[:n]


def ring_all_reduce(tree, axis_name: str):
    """psum-equivalent all-reduce of a pytree via a ppermute ring.

    The whole tree is flattened into one vector so the ring segments span
    parameter boundaries (maximum overlap granularity: 2(S-1) equal-size
    steps regardless of leaf shapes).
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return tree
    flat = jnp.concatenate([leaf.reshape(-1) for leaf in leaves])
    red = _ring_all_reduce_flat(flat, axis_name)
    out, off = [], 0
    for leaf in leaves:
        size = leaf.size
        out.append(red[off:off + size].reshape(leaf.shape))
        off += size
    return jax.tree_util.tree_unflatten(treedef, out)


def allreduce_bytes(num_params: int, axis_size: int, dtype_bytes: int = 4) -> dict:
    """Comm volume per device for one gradient all-reduce."""
    total = num_params * dtype_bytes
    ring = 2 * (axis_size - 1) / axis_size * total
    return dict(
        grad_bytes=total,
        ring_bytes_per_device=int(ring),
        steps=2 * (axis_size - 1),
        bytes_per_step=int(ring / max(2 * (axis_size - 1), 1)),
    )


# Exchange-table layout constants of the tile-sharded render body
# (parallel/sharded.py / compact_grad.py): 16 f32 attribute columns
# all-gathered forward, 9 live gradient rows psum-scattered back (dense
# exchange). Single source for the byte accounting used by
# bench/strip_bench.py, bench/strip_projection.py, and docs/SCALING.md.
ATTR_COLS = 16
GRAD_ROWS = 9


def tile_exchange_bytes(n: int, shards: int) -> dict:
    """Per-chip ICI volume of the dense attribute exchange at N Gaussians."""
    return dict(
        allgather=n * ATTR_COLS * 4 * (shards - 1) // shards,
        psum_scatter=n * GRAD_ROWS * 4 * (shards - 1) // shards,
    )
