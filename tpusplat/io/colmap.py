"""COLMAP binary model ingestion (cameras.bin / images.bin / points3D.bin).

The standard real-scene input for 3DGS training (Mip-NeRF360 etc.). The
reference viewer consumes only a trained .ply (``src/GSScene.cpp:26-68``);
training from a real capture needs the COLMAP sparse reconstruction: camera
intrinsics/extrinsics for supervision views plus the SfM point cloud for
initialization. Format per COLMAP's ``src/colmap/scene/reconstruction_io.cc``
(little-endian, no alignment).

COLMAP's camera frame is OpenCV-style (+x right, +y down, +z forward); our
``camera_from_world_view`` expects the OpenGL frame (+x right, +y up,
-z forward), so rows 1 and 2 of the world-to-camera matrix are negated here.
"""

from __future__ import annotations

import dataclasses
import os
import struct

import numpy as np

from tpusplat.camera import camera_from_world_view, quat_to_rotmat
from tpusplat.config import SH_C0
from tpusplat.types import Camera, GaussianParams

# model_id -> (name, num_params). Focal layout: SIMPLE_* use one focal
# (params[0]); the rest start with fx, fy. (colmap/src/colmap/sensor/models.h)
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}


@dataclasses.dataclass
class ColmapCamera:
    model: str
    width: int
    height: int
    params: np.ndarray  # model-specific; [f, cx, cy] or [fx, fy, cx, cy, ...]

    @property
    def focal(self) -> tuple[float, float]:
        if self.model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL", "RADIAL",
                          "SIMPLE_RADIAL_FISHEYE", "RADIAL_FISHEYE"):
            return float(self.params[0]), float(self.params[0])
        return float(self.params[0]), float(self.params[1])


@dataclasses.dataclass
class ColmapImage:
    name: str
    qvec: np.ndarray  # (w, x, y, z) world-to-camera rotation
    tvec: np.ndarray  # world-to-camera translation
    camera_id: int


def _read(f, fmt: str):
    return struct.unpack(fmt, f.read(struct.calcsize(fmt)))


def read_cameras_bin(path: str) -> dict[int, ColmapCamera]:
    cams: dict[int, ColmapCamera] = {}
    with open(path, "rb") as f:
        (num,) = _read(f, "<Q")
        for _ in range(num):
            cam_id, model_id, width, height = _read(f, "<iiQQ")
            name, n_params = CAMERA_MODELS[model_id]
            params = np.array(_read(f, f"<{n_params}d"))
            cams[cam_id] = ColmapCamera(name, int(width), int(height), params)
    return cams


def read_images_bin(path: str) -> list[ColmapImage]:
    images: list[ColmapImage] = []
    with open(path, "rb") as f:
        (num,) = _read(f, "<Q")
        for _ in range(num):
            _img_id = _read(f, "<i")[0]
            qvec = np.array(_read(f, "<4d"))
            tvec = np.array(_read(f, "<3d"))
            (camera_id,) = _read(f, "<i")
            name = b""
            while (c := f.read(1)) != b"\x00":
                name += c
            (n_pts2d,) = _read(f, "<Q")
            f.seek(n_pts2d * 24, os.SEEK_CUR)  # (x, y double, point3D_id i64)
            images.append(ColmapImage(name.decode(), qvec, tvec, camera_id))
    images.sort(key=lambda im: im.name)
    return images


def read_points3d_bin(path: str) -> tuple[np.ndarray, np.ndarray]:
    """-> (xyz [P, 3] float64, rgb [P, 3] uint8)."""
    xyz, rgb = [], []
    with open(path, "rb") as f:
        (num,) = _read(f, "<Q")
        for _ in range(num):
            _pid = _read(f, "<Q")[0]
            xyz.append(_read(f, "<3d"))
            rgb.append(_read(f, "<3B"))
            _err = _read(f, "<d")[0]
            (track_len,) = _read(f, "<Q")
            f.seek(track_len * 8, os.SEEK_CUR)  # (image_id i32, p2d_idx i32)
    return (
        np.asarray(xyz, np.float64).reshape(-1, 3),
        np.asarray(rgb, np.uint8).reshape(-1, 3),
    )


_CV_TO_GL = np.diag([1.0, -1.0, -1.0])  # +y down/+z fwd -> +y up/-z fwd


def colmap_to_camera(
    img: ColmapImage, cam: ColmapCamera, downscale: int = 1
) -> Camera:
    """One supervision Camera from a COLMAP (image, camera) pair."""
    r = quat_to_rotmat(img.qvec)  # world -> camera (OpenCV frame)
    w2c = np.eye(4)
    w2c[:3, :3] = _CV_TO_GL @ r
    w2c[:3, 3] = _CV_TO_GL @ img.tvec
    fx, fy = cam.focal
    w = cam.width // downscale
    h = cam.height // downscale
    # Focal scales with resolution; tan_fov = size / (2 * focal) is invariant.
    tan_fovx = cam.width / (2.0 * fx)
    tan_fovy = cam.height / (2.0 * fy)
    return camera_from_world_view(w2c, w, h, tan_fovx, tan_fovy)


def load_colmap_cameras(
    sparse_dir: str, downscale: int = 1
) -> tuple[list[Camera], list[str]]:
    """All registered views of a COLMAP sparse model, sorted by image name.

    Returns (cameras, image file names); pair the names with an images/
    directory (possibly ``images_<downscale>/``) to load targets.
    """
    cams = read_cameras_bin(os.path.join(sparse_dir, "cameras.bin"))
    images = read_images_bin(os.path.join(sparse_dir, "images.bin"))
    out_cams = [colmap_to_camera(im, cams[im.camera_id], downscale) for im in images]
    return out_cams, [im.name for im in images]


def _mean_knn_dist(xyz: np.ndarray, k: int = 3, max_ref: int = 20_000,
                   seed: int = 0) -> np.ndarray:
    """Mean distance to the k nearest neighbours, brute-force in chunks.

    For large clouds the neighbour pool is subsampled to ``max_ref`` points;
    distances shrink by at most ~(P/max_ref)^(1/3), well within the 3DGS
    init heuristic's tolerance (the scales are trained from step one).
    """
    p = xyz.shape[0]
    rng = np.random.default_rng(seed)
    ref = xyz if p <= max_ref else xyz[rng.choice(p, max_ref, replace=False)]
    out = np.empty(p, np.float32)
    chunk = max(1, int(2e8) // max(ref.shape[0], 1))
    for i in range(0, p, chunk):
        d2 = ((xyz[i:i + chunk, None, :] - ref[None, :, :]) ** 2).sum(-1)
        kk = min(k + 1, d2.shape[1])  # +1: self is in the pool at distance 0
        part = np.partition(d2, kk - 1, axis=1)[:, :kk]
        part = np.sort(part, axis=1)[:, 1:] if d2.shape[1] > 1 else part
        out[i:i + chunk] = np.sqrt(np.maximum(part, 0)).mean(1)
    return out


def init_from_points(
    xyz: np.ndarray,
    rgb: np.ndarray,
    sh_degree: int = 3,
    init_opacity: float = 0.1,
    seed: int = 0,
) -> GaussianParams:
    """Gaussian initialization from an SfM point cloud, the standard 3DGS
    recipe: means at the points, SH DC from the point colour
    (dc = (rgb - 0.5) / SH_C0), isotropic scales at the mean 3-NN distance,
    identity rotations, uniform low opacity."""
    n = xyz.shape[0]
    means = np.asarray(xyz, np.float32)
    dist = np.clip(_mean_knn_dist(means, seed=seed), 1e-7, None)
    log_scales = np.tile(np.log(dist)[:, None], (1, 3)).astype(np.float32)
    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1.0
    op = float(init_opacity)
    opacities = np.full(n, np.log(op / (1.0 - op)), np.float32)
    sh = np.zeros((n, 16, 3), np.float32)
    sh[:, 0, :] = (np.asarray(rgb, np.float32) / 255.0 - 0.5) / SH_C0
    return GaussianParams.create(
        means=means, log_scales=log_scales, quats=quats,
        opacities=opacities, sh=sh,
    )


def load_colmap_scene(root: str, downscale: int = 1):
    """One-call ingestion of a COLMAP capture directory.

    ``root`` must contain ``sparse/0`` (or ``sparse``) with the three .bin
    files. Returns (cameras, image_names, init_params).
    """
    sparse = os.path.join(root, "sparse", "0")
    if not os.path.isdir(sparse):
        sparse = os.path.join(root, "sparse")
    cams, names = load_colmap_cameras(sparse, downscale)
    xyz, rgb = read_points3d_bin(os.path.join(sparse, "points3D.bin"))
    return cams, names, init_from_points(xyz, rgb)
