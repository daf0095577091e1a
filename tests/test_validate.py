"""Runtime validation mode (debug_checks): poisoned inputs must trip the
in-graph counters and raise on the host; clean scenes must pass with zero
violations and a bit-identical image. Parity row: Vulkan validation layers
(src/vulkan/VulkanContext.cpp:11-35) + in-shader asserts (common.glsl:5-14).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tpusplat.camera import look_at_camera
from tpusplat.config import RenderConfig
from tpusplat.io.synthetic import random_scene
from tpusplat.ops.validate import raise_on_violations
from tpusplat.render import render, render_stages


def _setup(n=200, w=64, h=48):
    params = random_scene(n, seed=4, sh_degree=1, scale_range=(0.05, 0.3))
    cam = look_at_camera([0.2, 0.1, 6.0], [0, 0, 0], w, h, fov_deg=60.0)
    cfg = RenderConfig(sh_degree=1, capacity_mult=32, max_per_tile=1024,
                       tile_chunk=4, gauss_chunk=16, debug_checks=True)
    return params, cam, cfg


def test_clean_scene_passes_and_image_unchanged():
    params, cam, cfg = _setup()
    img_dbg, aux = render_stages(params, cam, cfg)
    raise_on_violations(aux)  # must not raise
    assert all(int(v) == 0 for v in aux["debug"].values())
    img_ref, _ = render_stages(
        params, cam, dataclasses.replace(cfg, debug_checks=False))
    # The extra check consumers can change XLA fusion choices (and hence fp
    # association) but not the math: allclose at float-reassociation scale.
    np.testing.assert_allclose(
        np.asarray(img_dbg), np.asarray(img_ref), atol=1e-6)


def test_nan_means_trip_validation():
    params, cam, cfg = _setup()
    means = np.asarray(params.means).copy()
    means[7] = np.nan  # poisoned upstream data (e.g. a corrupt PLY record)
    poisoned = dataclasses.replace(params, means=jnp.asarray(means))
    with pytest.raises(RuntimeError, match="validation failed"):
        render(poisoned, cam, cfg)


def test_nan_sh_trips_validation():
    params, cam, cfg = _setup()
    sh = np.asarray(params.sh).copy()
    sh[3, 0, 1] = np.inf
    poisoned = dataclasses.replace(params, sh=jnp.asarray(sh))
    _, aux = render_stages(poisoned, cam, cfg)
    assert int(aux["debug"]["nonfinite_color"]) > 0
    with pytest.raises(RuntimeError):
        raise_on_violations(aux)


def test_validation_counts_pallas_path():
    params, cam, cfg = _setup()
    cfg = dataclasses.replace(cfg, use_pallas=True)
    _, aux = render_stages(params, cam, cfg)
    raise_on_violations(aux)
    assert all(int(v) == 0 for v in aux["debug"].values())


def test_no_debug_key_when_disabled():
    params, cam, cfg = _setup()
    _, aux = render_stages(
        params, cam, dataclasses.replace(cfg, debug_checks=False))
    assert "debug" not in aux
    raise_on_violations(aux)  # no-op without the key


def test_env_overrides(monkeypatch):
    """TPUSPLAT_* env layer (the VKGS_ analogue, apps/viewer/main.cpp:46-50)."""
    base = RenderConfig()
    assert base.with_env_overrides() is base  # no env -> untouched instance
    monkeypatch.setenv("TPUSPLAT_USE_PALLAS", "1")
    monkeypatch.setenv("TPUSPLAT_DEBUG_CHECKS", "true")
    monkeypatch.setenv("TPUSPLAT_CAPACITY_MULT", "6.5")
    monkeypatch.setenv("TPUSPLAT_MAX_PER_TILE", "512")
    cfg = base.with_env_overrides()
    assert cfg.use_pallas and cfg.debug_checks
    assert cfg.capacity_mult == 6.5 and cfg.max_per_tile == 512
    monkeypatch.setenv("TPUSPLAT_USE_PALLAS", "off")
    assert not base.with_env_overrides().use_pallas

    # Sharded-training knobs (round 5): exchange strategy and the
    # regrow-tunable capacity multipliers reach the product CLIs via env.
    monkeypatch.setenv("TPUSPLAT_GRAD_EXCHANGE", "compact")
    monkeypatch.setenv("TPUSPLAT_GRAD_A2A_MULT", "1.7")
    monkeypatch.setenv("TPUSPLAT_STRIP_GAUSS_MULT", "2.5")
    cfg2 = base.with_env_overrides()
    assert cfg2.grad_exchange == "compact"
    assert cfg2.grad_a2a_mult == 1.7 and cfg2.strip_gauss_mult == 2.5
    # A typo'd strategy must fail loudly, not silently fall back.
    monkeypatch.setenv("TPUSPLAT_GRAD_EXCHANGE", "Compact")
    import pytest

    with pytest.raises(ValueError):
        base.with_env_overrides()
