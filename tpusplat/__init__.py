"""tpusplat — a TPU-native differentiable 3D Gaussian Splatting framework.

Built from scratch in JAX/Pallas with the capabilities of shg8/3DGS.cpp
(a Vulkan-compute 3DGS viewer; see /root/reference and SURVEY.md), re-designed
for TPU: static-shape tile pipeline, sort/scan algorithms instead of
atomics, Pallas rasterization kernels with a custom VJP, and shard_map
scaling over device meshes.

Public API (the analogue of the reference's ``VulkanSplatting`` facade,
include/3dgs/3dgs.h:11-51):

    from tpusplat import load_scene, render, RenderConfig, Camera
    params = load_scene("scene.ply")
    img = render(params, camera, RenderConfig())
"""

from tpusplat.config import RenderConfig
from tpusplat.types import GaussianParams, Camera
from tpusplat.camera import make_camera, look_at_camera
from tpusplat.io.ply import load_ply, save_ply

# `load_scene` is the reference-API-flavoured alias (GSScene::load analogue).
load_scene = load_ply
from tpusplat.io.synthetic import random_scene
from tpusplat.render import render, render_auto, render_stages

__all__ = [
    "RenderConfig",
    "GaussianParams",
    "Camera",
    "make_camera",
    "look_at_camera",
    "load_ply",
    "load_scene",
    "save_ply",
    "random_scene",
    "render",
    "render_auto",
    "render_stages",
]

__version__ = "0.1.0"
