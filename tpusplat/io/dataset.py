"""Training datasets: (camera, image) pairs.

Two formats:
  * a directory of ``.npz`` files with keys view/proj/cam_pos/tan_fovx/
    tan_fovy/width/height/image (our native format; see ``save_view``);
  * NeRF-synthetic ``transforms.json`` (camera_angle_x + per-frame
    ``transform_matrix`` camera-to-world in the OpenGL convention), the
    standard 3DGS training input alongside COLMAP.

The reference viewer consumes only a .ply scene; datasets are a
training-side addition (README.md:88 'Training' TODO).
"""

from __future__ import annotations

import json
import os

import numpy as np

from tpusplat.camera import camera_from_world_view
from tpusplat.types import Camera


def save_view(path, camera: Camera, image) -> None:
    np.savez_compressed(
        path,
        view=np.asarray(camera.view),
        proj=np.asarray(camera.proj),
        cam_pos=np.asarray(camera.cam_pos),
        tan_fovx=np.asarray(camera.tan_fovx),
        tan_fovy=np.asarray(camera.tan_fovy),
        width=camera.width,
        height=camera.height,
        image=np.asarray(image, np.float32),
    )


def load_views(directory):
    """Load all .npz views from a directory -> (list[Camera], list[np.ndarray])."""
    import glob

    cams, images = [], []
    for f in sorted(glob.glob(os.path.join(directory, "*.npz"))):
        d = np.load(f)
        cams.append(
            Camera.from_matrices(
                d["view"], d["proj"], d["cam_pos"], float(d["tan_fovx"]),
                float(d["tan_fovy"]), int(d["width"]), int(d["height"]),
            )
        )
        images.append(np.asarray(d["image"], np.float32))
    return cams, images


def load_nerf_synthetic(directory, split: str = "train", white_background: bool = False):
    """Load a NeRF-synthetic dataset (transforms_<split>.json + PNGs).

    Returns (list[Camera], list[np.ndarray HxWx3 in [0,1]]). The
    transform_matrix is camera-to-world with OpenGL axes (+x right, +y up,
    -z forward), matching our pre-flip camera frame, so the view matrix is
    its inverse.
    """
    path = os.path.join(directory, f"transforms_{split}.json")
    if not os.path.exists(path):
        path = os.path.join(directory, "transforms.json")
    with open(path) as f:
        meta = json.load(f)
    cam_angle_x = float(meta["camera_angle_x"])

    cams, images = [], []
    for frame in meta["frames"]:
        img_path = os.path.join(directory, frame["file_path"])
        if not os.path.splitext(img_path)[1]:
            img_path += ".png"
        img = _read_png(img_path)
        if img.shape[-1] == 4:
            alpha = img[..., 3:4]
            bg = 1.0 if white_background else 0.0
            img = img[..., :3] * alpha + bg * (1 - alpha)
        h, w = img.shape[:2]
        tan_fovx = np.tan(cam_angle_x / 2)
        tan_fovy = tan_fovx * h / w

        c2w = np.asarray(frame["transform_matrix"], np.float64)
        w2c = np.linalg.inv(c2w)
        cams.append(
            camera_from_world_view(w2c, w, h, tan_fovx, tan_fovy)
        )
        images.append(img.astype(np.float32))
    return cams, images


def save_png(path, img) -> None:
    """Write [H, W, 3] floats in [0,1] as an 8-bit RGB PNG (no deps)."""
    import struct
    import zlib

    arr = np.round(np.clip(np.asarray(img), 0.0, 1.0) * 255.0).astype(np.uint8)
    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag, body):
        out = struct.pack(">I", len(body)) + tag + body
        return out + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    png = b"\x89PNG\r\n\x1a\n"
    png += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
    png += chunk(b"IDAT", zlib.compress(raw, 6))
    png += chunk(b"IEND", b"")
    with open(path, "wb") as f:
        f.write(png)


def read_image(path) -> np.ndarray:
    """Read an image file to [H, W, C] floats in [0, 1] (PIL when
    available — any format; otherwise the dep-free 8-bit PNG reader)."""
    return _read_png(path)


def is_colmap(directory) -> bool:
    return os.path.isdir(os.path.join(directory, "sparse"))


def is_nerf_synthetic(directory) -> bool:
    return any(
        os.path.exists(os.path.join(directory, f"transforms{s}.json"))
        for s in ("_train", "")
    )


def _read_png(path):
    try:
        from PIL import Image

        return np.asarray(Image.open(path), np.float32) / 255.0
    except ImportError:
        pass
    # Minimal PNG reader (8-bit RGB/RGBA, non-interlaced) without deps.
    import struct
    import zlib

    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    idat = b""
    w = h = channels = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
            assert depth == 8 and interlace == 0, "unsupported PNG variant"
            channels = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = w * channels
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw[pos + 1:pos + 1 + stride], np.uint8).copy()
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            line = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((int(left) + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - channels]) if i >= channels else 0
                b = int(prev[i])
                c = int(prev[i - channels]) if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        out[y] = line
        prev = line
    return out.reshape(h, w, channels).astype(np.float32) / 255.0
