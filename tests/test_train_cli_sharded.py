"""apps/train.py --mesh: the multi-chip sharded training path as a
product path (not just a test/bench path), driven end-to-end through the
CLI on the virtual 8-device mesh."""

import contextlib
import io
import json

import numpy as np


def test_train_cli_sharded_mesh(tmp_path):
    from apps.train import main as train_main
    from tpusplat.io.ply import load_ply

    out_ply = str(tmp_path / "sharded.ply")
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        train_main([
            "--synthetic", "--steps", "4", "--n-init", "600",
            "--capacity", "2048", "--width", "64", "--height", "64",
            "--cameras", "4", "--densify-every", "0",
            "--opacity-reset-every", "0", "--log-every", "2",
            "--mesh", "2x4", "--out", out_ply,
        ])
    lines = [json.loads(ln) for ln in err.getvalue().splitlines()
             if ln.startswith("{")]
    assert any(ln.get("mesh") == "2x4" for ln in lines), err.getvalue()[-1500:]
    losses = [ln["loss"] for ln in lines if "loss" in ln]
    assert len(losses) >= 2 and all(np.isfinite(losses))
    assert all(ln.get("overflow", 0) == 0 for ln in lines if "loss" in ln)
    evals = [ln for ln in lines if "psnr" in ln]
    assert evals and np.isfinite(evals[-1]["psnr"])

    params = load_ply(out_ply)
    assert np.isfinite(np.asarray(params.means)).all()


def test_train_cli_sharded_overlap(tmp_path):
    from apps.train import main as train_main

    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        train_main([
            "--synthetic", "--steps", "2", "--n-init", "400",
            "--capacity", "1024", "--width", "64", "--height", "64",
            "--cameras", "2", "--densify-every", "0",
            "--opacity-reset-every", "0", "--log-every", "1",
            "--mesh", "2x4", "--overlap",
            "--out", str(tmp_path / "ovl.ply"),
        ])
    lines = [json.loads(ln) for ln in err.getvalue().splitlines()
             if ln.startswith("{")]
    assert any(ln.get("overlap") for ln in lines), err.getvalue()[-1500:]
    losses = [ln["loss"] for ln in lines if "loss" in ln]
    assert losses and all(np.isfinite(losses))


def test_viewer_cli_sharded_mesh(tmp_path):
    """apps/viewer.py --mesh renders through the tile-sharded pipeline."""
    from apps.viewer import main as viewer_main
    from tpusplat.io.dataset import read_image

    out = str(tmp_path / "r.png")
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        viewer_main(["test", "-w", "64", "--height", "64", "-o", out,
                     "--mesh", "2x4"])
    lines = [json.loads(ln) for ln in err.getvalue().splitlines()
             if ln.startswith("{")]
    frame = [ln for ln in lines if "frame" in ln]
    assert frame and frame[0]["capacity_overflow"] == 0
    img = read_image(out)
    assert img.shape[:2] == (64, 64) and np.isfinite(img).all()
