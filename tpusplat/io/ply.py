"""3DGS .ply scene IO.

Reads/writes the standard 3D-Gaussian-Splatting PLY layout the reference
consumes (``src/GSScene.cpp:17-24`` ``VertexStorage``): per-vertex
62 float32 properties —

    x y z nx ny nz f_dc_0..2 f_rest_0..44 opacity scale_0..2 rot_0..3

SH coefficients on disk are channel-planar (3 DC values then 15 per channel);
in memory we use the reference's GPU layout of interleaved RGB per coefficient
(``src/GSScene.cpp:47-55``). Unlike the reference we keep parameters *raw*
(no exp/sigmoid/normalize at load — those happen in-graph) so they stay
trainable; see :class:`tpusplat.types.GaussianParams`.

An optional C++ fast path (:mod:`tpusplat.io.native_loader`) parses the binary
body; numpy is the fallback and the behavioural contract.
"""

from __future__ import annotations

import io as _io
import os

import numpy as np

from tpusplat.types import GaussianParams

_FLOATS_PER_VERTEX = 62
_PROPS = (
    ["x", "y", "z", "nx", "ny", "nz"]
    + [f"f_dc_{i}" for i in range(3)]
    + [f"f_rest_{i}" for i in range(45)]
    + ["opacity"]
    + [f"scale_{i}" for i in range(3)]
    + [f"rot_{i}" for i in range(4)]
)


def _parse_header(f) -> tuple[int, list[tuple[str, str]], str]:
    """Parse the text header; returns (num_vertices, [(type, name)], format)."""
    line = f.readline().decode("ascii").strip()
    if line != "ply":
        raise ValueError("not a PLY file")
    num_vertices = 0
    fmt = ""
    props: list[tuple[str, str]] = []
    in_vertex = False
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unexpected EOF in PLY header")
        tokens = line.decode("ascii").strip().split()
        if not tokens:
            continue
        if tokens[0] == "format":
            fmt = tokens[1]
        elif tokens[0] == "element":
            in_vertex = tokens[1] == "vertex"
            if in_vertex:
                num_vertices = int(tokens[2])
        elif tokens[0] == "property" and in_vertex:
            props.append((tokens[1], tokens[2]))
        elif tokens[0] == "end_header":
            break
    return num_vertices, props, fmt


def raw_arrays_from_records(rec: np.ndarray) -> dict[str, np.ndarray]:
    """Split a [N, 62] float32 record array into raw parameter arrays,
    interleaving SH exactly as ``src/GSScene.cpp:47-55``."""
    n = rec.shape[0]
    sh_planar = rec[:, 6:54]  # [N, 48]: 3 DC + 15 per channel
    sh = np.empty((n, 16, 3), np.float32)
    sh[:, 0, :] = sh_planar[:, 0:3]
    rest = sh_planar[:, 3:].reshape(n, 3, 15)  # [N, channel, coeff]
    sh[:, 1:, :] = np.moveaxis(rest, 1, 2)
    return dict(
        means=rec[:, 0:3].copy(),
        sh=sh,
        opacities=rec[:, 54].copy(),
        log_scales=rec[:, 55:58].copy(),
        quats=rec[:, 58:62].copy(),  # (w, x, y, z) on disk; common.glsl:51-55
    )


def load_ply(path: str | os.PathLike, use_native: bool = True) -> GaussianParams:
    """Load a 3DGS .ply into raw GaussianParams."""
    with open(path, "rb") as f:
        num_vertices, props, fmt = _parse_header(f)
        if fmt != "binary_little_endian":
            raise ValueError(f"unsupported PLY format {fmt!r}")
        names = [p[1] for p in props]
        if names != _PROPS:
            # Accept any all-float layout that contains our properties by
            # reordering columns; bail only if something is missing.
            missing = [p for p in _PROPS if p not in names]
            if missing or any(t != "float" for t, _ in props):
                raise ValueError(f"unsupported PLY vertex layout (missing {missing[:4]}...)")
        body_offset = f.tell()
        nfloats = len(props)
        if use_native:
            from tpusplat.io import native_loader

            rec = native_loader.read_records(path, body_offset, num_vertices, nfloats)
        else:
            rec = None
        if rec is None:
            rec = np.fromfile(f, dtype="<f4", count=num_vertices * nfloats).reshape(
                num_vertices, nfloats
            )
    if names != _PROPS:
        order = [names.index(p) for p in _PROPS]
        rec = rec[:, order]
    arrays = raw_arrays_from_records(np.ascontiguousarray(rec))
    return GaussianParams.create(**arrays)


def save_ply(path: str | os.PathLike, params: GaussianParams, only_alive: bool = True) -> None:
    """Write raw GaussianParams to the standard 3DGS .ply layout.

    The reference has no writer (SURVEY.md §5 checkpoint row); this provides
    the missing direction, bit-compatible with the read layout. Normals are
    written as zeros (asserted zero by the reference, ``src/GSScene.cpp:56-58``).
    """
    means = np.asarray(params.means, np.float32)
    sh = np.asarray(params.sh, np.float32)
    opac = np.asarray(params.opacities, np.float32)
    scales = np.asarray(params.log_scales, np.float32)
    quats = np.asarray(params.quats, np.float32)
    alive = np.asarray(params.alive, bool)
    if only_alive:
        means, sh, opac, scales, quats = (
            a[alive] for a in (means, sh, opac, scales, quats)
        )
    n = means.shape[0]

    rec = np.zeros((n, _FLOATS_PER_VERTEX), np.float32)
    rec[:, 0:3] = means
    rec[:, 6:9] = sh[:, 0, :]
    rec[:, 9:54] = np.moveaxis(sh[:, 1:, :], 2, 1).reshape(n, 45)
    rec[:, 54] = opac
    rec[:, 55:58] = scales
    rec[:, 58:62] = quats

    header = _io.BytesIO()
    header.write(b"ply\nformat binary_little_endian 1.0\n")
    header.write(f"element vertex {n}\n".encode())
    for name in _PROPS:
        header.write(f"property float {name}\n".encode())
    header.write(b"end_header\n")
    with open(path, "wb") as f:
        f.write(header.getvalue())
        rec.astype("<f4").tofile(f)
