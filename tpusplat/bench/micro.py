"""Microbenchmarks of the TPU primitives the binning pipeline is built from.

Measures, at production scale (C ~ 5.6M instances, N ~ 1.4M Gaussians):
  * 1-D and row gathers (the instance-expansion / pack primitives)
  * unique-index scatter (candidate radix-scatter primitive)
  * lax.sort variants (1/2/3 operands, stable vs key-tiebreak)
  * cumsum, argsort at N

Run: python -m tpusplat.bench.micro
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)


def timeit(fn, *args, iters=5):
    fn = jax.jit(fn)
    out = fn(*args)
    _force(out)

    def run(k):
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = fn(*args)
        _force(o)
        return time.perf_counter() - t0

    t1 = run(max(1, iters // 2))
    t2 = run(max(1, iters // 2) + iters)
    return (t2 - t1) / iters * 1e3


def main():
    C = 5_603_328  # garden capacity (instance slots)
    N = 1_400_000
    T = 8160  # tiles at 1080p
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(C).astype(np.int32))
    idx_n = jnp.asarray(rng.integers(0, N, size=C).astype(np.int32))
    tile_key = jnp.asarray(np.sort(rng.integers(0, T, size=C)).astype(np.int32))
    tile_rand = jnp.asarray(rng.integers(0, T, size=C).astype(np.int32))
    vals_c = jnp.asarray(rng.uniform(size=C).astype(np.float32))
    table16 = jnp.asarray(rng.uniform(size=(N, 16)).astype(np.float32))
    table8 = table16[:, :8]
    depth = jnp.asarray(rng.uniform(size=N).astype(np.float32))
    slots = lax.iota(jnp.int32, C)

    r = {}
    r["gather_1d_C_from_C"] = timeit(lambda p, v: v[p], perm, vals_c)
    r["gather_1d_C_from_N"] = timeit(lambda i, v: v[i], idx_n, depth)
    r["gather_rows_C_16"] = timeit(lambda i, t: t[i], idx_n, table16)
    r["gather_rows_C_8"] = timeit(lambda i, t: t[i], idx_n, table8)
    r["scatter_unique_C"] = timeit(
        lambda p, v: jnp.zeros((C,), jnp.float32).at[p].set(
            v, unique_indices=True, mode="drop"),
        perm, vals_c)
    r["scatter_unique_C_i32"] = timeit(
        lambda p: jnp.zeros((C,), jnp.int32).at[p].set(
            slots, unique_indices=True, mode="drop"),
        perm)
    r["cumsum_C"] = timeit(lambda v: jnp.cumsum(v), vals_c)
    r["sort_C_1key_1payload"] = timeit(
        lambda k, s: lax.sort((k, s), num_keys=1, is_stable=True),
        tile_rand, slots)
    r["sort_C_1key_2payload"] = timeit(
        lambda k, g, s: lax.sort((k, g, s), num_keys=1, is_stable=True),
        tile_rand, idx_n, slots)
    r["sort_C_2keys"] = timeit(
        lambda k, s: lax.sort((k, s), num_keys=2, is_stable=False),
        tile_rand, slots)
    r["sort_C_1key_nonstable"] = timeit(
        lambda k, s: lax.sort((k, s), num_keys=1, is_stable=False),
        tile_rand, slots)
    r["argsort_N_f32_stable"] = timeit(
        lambda d: jnp.argsort(d, stable=True), depth)
    r["argsort_C_i32"] = timeit(lambda p: jnp.argsort(p), perm)
    r["sort_presorted_C"] = timeit(
        lambda k, s: lax.sort((k, s), num_keys=1, is_stable=True),
        tile_key, slots)

    # --- the primitives inside expand_instances / pack bwd ---
    slab = jnp.asarray(rng.uniform(size=(16, C)).astype(np.float32))
    rows16 = jnp.asarray(rng.uniform(size=(C, 16)).astype(np.float32))
    off_n = jnp.asarray(np.sort(rng.integers(0, C, size=N)).astype(np.int32))
    r["scatter_iota_C"] = timeit(
        lambda p: jnp.zeros((C,), jnp.int32).at[p].set(
            lax.iota(jnp.int32, C), unique_indices=True, mode="drop"), perm)
    r["scatter_marks_N_into_C"] = timeit(
        lambda o: jnp.zeros((C,), jnp.int32).at[o].max(
            lax.iota(jnp.int32, N) + 1, mode="drop", unique_indices=True), off_n)
    r["cummax_C"] = timeit(lambda m: lax.cummax(m), perm)
    r["cumsum_C_i32"] = timeit(lambda m: jnp.cumsum(m), perm)
    r["gather_rows_C6_from_N"] = timeit(
        lambda i, t: t[i], idx_n, jnp.asarray(
            rng.uniform(size=(N, 6)).astype(np.float32)))
    r["transpose_16C_to_C16"] = timeit(
        lambda s: jnp.transpose(s, (1, 0)), slab)
    r["transpose_C16_to_16C"] = timeit(
        lambda s: jnp.transpose(s, (1, 0)), rows16)
    r["scatter_rows_C16"] = timeit(
        lambda p, v: jnp.zeros((C, 16), jnp.float32).at[p].set(
            v, unique_indices=True, mode="drop"), perm, rows16)
    r["gather_rows_C16_from_C"] = timeit(lambda p, v: v[p], perm, rows16)
    r["elementwise_10op_C"] = timeit(
        lambda v: ((v * 2 + 1) * v - 3) * (v + 0.5) * (v - 0.25) + v * v, vals_c)

    w = max(len(k) for k in r)
    for k, v in r.items():
        print(f"{k:<{w}} {v:10.2f} ms", file=sys.stderr, flush=True)
    import json
    print(json.dumps({k: round(v, 3) for k, v in r.items()}))


if __name__ == "__main__":
    main()
