"""Densification, pruning, opacity reset, and checkpoint round-trip."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpusplat.io.synthetic import random_scene
from tpusplat.train.densify import DensifyConfig, densify_and_prune, reset_opacity
from tpusplat.train.step import create_train_state, make_optimizer


def _state_with(n=64, n_alive=32):
    params = random_scene(n, seed=0, sh_degree=0)
    alive = np.zeros(n, bool)
    alive[:n_alive] = True
    params = dataclasses.replace(params, alive=jnp.asarray(alive))
    opt = make_optimizer()
    return create_train_state(params, opt), opt


def test_clone_into_free_slots():
    state, _ = _state_with()
    # Mark gaussians 0..3 as high-gradient candidates (small scales -> clone).
    ga = np.zeros(64, np.float32)
    ga[:4] = 1.0
    state = dataclasses.replace(
        state, grad_accum=jnp.asarray(ga), grad_count=jnp.ones(64, jnp.float32)
    )
    dcfg = DensifyConfig(grad_threshold=0.5, percent_dense=10.0, max_world_scale=0.0)  # never split
    out = densify_and_prune(state, jax.random.key(0), dcfg, scene_extent=1.0)
    alive = np.asarray(out.params.alive)
    assert alive.sum() == 36  # 32 alive + 4 clones
    # Clones live in previously-free slots and copy source params.
    new_slots = np.where(alive[32:])[0] + 32
    assert len(new_slots) == 4
    src_means = np.asarray(state.params.means)[:4]
    new_means = np.asarray(out.params.means)[new_slots]
    # Each new mean equals one of the source means (rank order may permute).
    for m in new_means:
        assert np.min(np.linalg.norm(src_means - m, axis=1)) < 1e-6


def test_split_shrinks_and_moves():
    state, _ = _state_with()
    ga = np.zeros(64, np.float32)
    ga[:2] = 1.0
    state = dataclasses.replace(
        state, grad_accum=jnp.asarray(ga), grad_count=jnp.ones(64, jnp.float32)
    )
    dcfg = DensifyConfig(grad_threshold=0.5, percent_dense=1e-6, max_world_scale=0.0)
    out = densify_and_prune(state, jax.random.key(1), dcfg, scene_extent=1.0)
    # Source scales shrank by 1.6.
    np.testing.assert_allclose(
        np.asarray(out.params.log_scales)[:2],
        np.asarray(state.params.log_scales)[:2] - np.log(1.6),
        rtol=1e-6,
    )
    # Source means moved (sampled).
    assert np.abs(np.asarray(out.params.means)[:2]
                  - np.asarray(state.params.means)[:2]).max() > 1e-5
    assert np.asarray(out.params.alive).sum() == 34


def test_prune_low_opacity():
    state, _ = _state_with()
    op = np.asarray(state.params.opacities).copy()
    op[:5] = -10.0  # sigmoid ~ 4.5e-5 < min_opacity
    state = dataclasses.replace(
        state, params=dataclasses.replace(state.params, opacities=jnp.asarray(op))
    )
    out = densify_and_prune(state, jax.random.key(0), DensifyConfig(max_world_scale=0.0), 1.0)
    alive = np.asarray(out.params.alive)
    assert not alive[:5].any()
    assert alive[5:32].all()


def test_grant_limited_by_free_slots():
    state, _ = _state_with(n=64, n_alive=62)  # only 2 free slots
    ga = np.ones(64, np.float32)  # every alive gaussian wants to densify
    state = dataclasses.replace(
        state, grad_accum=jnp.asarray(ga), grad_count=jnp.ones(64, jnp.float32)
    )
    dcfg = DensifyConfig(grad_threshold=0.5, percent_dense=10.0, max_world_scale=0.0)
    out = densify_and_prune(state, jax.random.key(0), dcfg, 1.0)
    assert np.asarray(out.params.alive).sum() == 64  # all slots filled, no more


def test_opacity_reset():
    state, _ = _state_with()
    out = reset_opacity(state, ceiling=0.01)
    sig = 1 / (1 + np.exp(-np.asarray(out.params.opacities)))
    assert (sig <= 0.0101).all()


def test_densify_jits():
    state, _ = _state_with()
    f = jax.jit(densify_and_prune, static_argnames=("dcfg", "scene_extent"))
    out = f(state, jax.random.key(0), DensifyConfig(max_world_scale=0.0), 1.0)
    assert np.asarray(out.params.alive).sum() > 0


def test_checkpoint_roundtrip_npz(tmp_path):
    from tpusplat.train.checkpoint import load_checkpoint, save_checkpoint

    state, _ = _state_with()
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state)
    like = jax.tree_util.tree_map(np.zeros_like, state)
    restored = load_checkpoint(path, like)
    np.testing.assert_array_equal(
        np.asarray(restored.params.means), np.asarray(state.params.means)
    )
    np.testing.assert_array_equal(np.asarray(restored.step), np.asarray(state.step))
