"""Binary VTK XML rectilinear-grid writer (.vtr), written from the VTK file
format specification.

Produces the same output *schema* as the reference's export path — cell data
``velocity`` (3-component, z = 0) and ``pressure`` on a rectilinear grid
(reference facade: ``VTKWrapper.py:6-10``; writer capability:
``pyevtk/hl.py:122-192`` ``gridToVTK``) — so downstream ParaView/VisIt
pipelines built for the reference keep working.  The writer itself is a
clean-room implementation: one XML header with ``format="appended"`` data
arrays and a single raw little-endian appended-data block.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, Tuple

import numpy as np

_VTK_TYPES = {
    np.dtype("float32"): "Float32",
    np.dtype("float64"): "Float64",
    np.dtype("int32"): "Int32",
    np.dtype("int64"): "Int64",
    np.dtype("uint8"): "UInt8",
}


def _flatten_cellwise(arr: np.ndarray) -> np.ndarray:
    """VTK wants x-fastest (Fortran) cell ordering; components interleaved."""
    if arr.ndim == 3:  # (ncomp, nx, ny) vector -> (cells, ncomp) interleaved
        comps = [c.flatten(order="F") for c in arr]
        return np.stack(comps, axis=-1).ravel()
    return arr.flatten(order="F")


class _AppendedBlock:
    """Raw-encoded appended-data block: each array is a little-endian u32
    length prefix + bytes; ``append`` returns the byte offset inside the
    block (what the XML ``DataArray offset=`` attribute references).
    Shared by all three writers so the framing exists exactly once."""

    def __init__(self):
        self._blobs: list[bytes] = []
        self._off = 0

    def append(self, a: np.ndarray) -> int:
        raw = np.ascontiguousarray(a).tobytes()
        self._blobs.append(struct.pack("<I", len(raw)) + raw)
        off = self._off
        self._off += 4 + len(raw)
        return off

    def write(self, fh) -> None:
        for b in self._blobs:
            fh.write(b)


def _write_vtk_file(path: str, lines: list, block: _AppendedBlock) -> str:
    """Emit XML header lines + '<AppendedData>_' + block + footer."""
    lines = lines + ['  <AppendedData encoding="raw">']
    with open(path, "wb") as fh:
        fh.write(("\n".join(lines) + "\n_").encode())
        block.write(fh)
        fh.write("\n  </AppendedData>\n</VTKFile>\n".encode())
    return path


def write_vtr(
    path: str,
    cell_data: Dict[str, np.ndarray],
    spacing: Tuple[float, float] = (1.0, 1.0),
) -> str:
    """Write 2-D cell-centered fields to a binary ``.vtr`` file.

    ``cell_data`` values are ``(nx, ny)`` scalars or ``(ncomp, nx, ny)``
    vectors, with y index 0 at the *bottom* (VTK convention — callers flip).
    """
    first = next(iter(cell_data.values()))
    nx, ny = (first.shape[-2], first.shape[-1])
    if not path.endswith(".vtr"):
        path = path + ".vtr"

    xs = np.arange(nx + 1, dtype=np.float64) * spacing[0]
    ys = np.arange(ny + 1, dtype=np.float64) * spacing[1]
    zs = np.zeros(1, dtype=np.float64)

    blk = _AppendedBlock()
    coord_offs = [blk.append(a) for a in (xs, ys, zs)]
    arrays = []
    for name, arr in cell_data.items():
        arr = np.asarray(arr)
        ncomp = arr.shape[0] if arr.ndim == 3 else 1
        flat = _flatten_cellwise(arr)
        arrays.append((name, ncomp, _VTK_TYPES[flat.dtype], blk.append(flat)))

    extent = f"0 {nx} 0 {ny} 0 0"
    lines = [
        '<?xml version="1.0"?>',
        '<VTKFile type="RectilinearGrid" version="1.0" '
        'byte_order="LittleEndian" header_type="UInt32">',
        f'  <RectilinearGrid WholeExtent="{extent}">',
        f'    <Piece Extent="{extent}">',
        "      <Coordinates>",
    ]
    for nm, o in zip(("x", "y", "z"), coord_offs):
        lines.append(
            f'        <DataArray type="Float64" Name="{nm}" '
            f'NumberOfComponents="1" format="appended" offset="{o}"/>'
        )
    lines.append("      </Coordinates>")
    lines.append("      <CellData>")
    for name, ncomp, vtype, o in arrays:
        lines.append(
            f'        <DataArray type="{vtype}" Name="{name}" '
            f'NumberOfComponents="{ncomp}" format="appended" offset="{o}"/>'
        )
    lines += [
        "      </CellData>",
        "    </Piece>",
        "  </RectilinearGrid>",
    ]
    return _write_vtk_file(path, lines, blk)


def write_vti(
    path: str,
    cell_data: Dict[str, np.ndarray],
    spacing: Tuple[float, float] = (1.0, 1.0),
    origin: Tuple[float, float] = (0.0, 0.0),
) -> str:
    """Uniform-grid ImageData (.vti) writer — the capability of the vendored
    pyevtk's ``imageToVTK`` (reference: ``pyevtk/hl.py:73-119``)."""
    first = next(iter(cell_data.values()))
    nx, ny = (first.shape[-2], first.shape[-1])
    if not path.endswith(".vti"):
        path = path + ".vti"

    blk = _AppendedBlock()
    arrays = []
    for name, arr in cell_data.items():
        arr = np.asarray(arr)
        ncomp = arr.shape[0] if arr.ndim == 3 else 1
        flat = _flatten_cellwise(arr)
        arrays.append((name, ncomp, _VTK_TYPES[flat.dtype], blk.append(flat)))

    extent = f"0 {nx} 0 {ny} 0 0"
    lines = [
        '<?xml version="1.0"?>',
        '<VTKFile type="ImageData" version="1.0" '
        'byte_order="LittleEndian" header_type="UInt32">',
        f'  <ImageData WholeExtent="{extent}" '
        f'Origin="{origin[0]} {origin[1]} 0" '
        f'Spacing="{spacing[0]} {spacing[1]} 1">',
        f'    <Piece Extent="{extent}">',
        "      <CellData>",
    ]
    for name, ncomp, vtype, o in arrays:
        lines.append(
            f'        <DataArray type="{vtype}" Name="{name}" '
            f'NumberOfComponents="{ncomp}" format="appended" offset="{o}"/>'
        )
    lines += [
        "      </CellData>",
        "    </Piece>",
        "  </ImageData>",
    ]
    return _write_vtk_file(path, lines, blk)


def write_vtp_points(
    path: str,
    x: np.ndarray,
    y: np.ndarray,
    point_data: Dict[str, np.ndarray],
    z: np.ndarray | None = None,
) -> str:
    """Scattered-points PolyData (.vtp) writer — the capability of the
    vendored pyevtk's ``pointsToVTK`` (reference: ``pyevtk/hl.py:196-244``);
    used for exporting detected vortex centers and probe locations."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.zeros_like(x) if z is None else np.asarray(z, np.float64)
    n = len(x)
    pts = np.stack([x, y, z], axis=-1).ravel()
    if not path.endswith(".vtp"):
        path = path + ".vtp"

    blk = _AppendedBlock()
    offsets = {"points": blk.append(pts)}
    names = []
    for name, arr in point_data.items():
        arr = np.asarray(arr)
        names.append((name, _VTK_TYPES[arr.dtype]))
        offsets[name] = blk.append(arr)

    lines = [
        '<?xml version="1.0"?>',
        '<VTKFile type="PolyData" version="1.0" '
        'byte_order="LittleEndian" header_type="UInt32">',
        "  <PolyData>",
        f'    <Piece NumberOfPoints="{n}" NumberOfVerts="0" NumberOfLines="0" '
        'NumberOfStrips="0" NumberOfPolys="0">',
        "      <Points>",
        f'        <DataArray type="Float64" NumberOfComponents="3" '
        f'format="appended" offset="{offsets["points"]}"/>',
        "      </Points>",
        "      <PointData>",
    ]
    for name, vtype in names:
        lines.append(
            f'        <DataArray type="{vtype}" Name="{name}" '
            f'NumberOfComponents="1" format="appended" '
            f'offset="{offsets[name]}"/>'
        )
    lines += [
        "      </PointData>",
        "    </Piece>",
        "  </PolyData>",
    ]
    return _write_vtk_file(path, lines, blk)


def save_to_vtk(
    velocity: np.ndarray,
    rho: np.ndarray,
    prefix: str,
    save_number: int | str = 0,
    out_dir: str = ".",
) -> str:
    """Reference-compatible facade (reference: ``VTKWrapper.py:6-10``):
    cell data ``velocity`` (ux, uy, 0) and ``pressure`` (rho).

    ``velocity (2, nx, ny)`` / ``rho (nx, ny)`` use the framework layout
    (y index 0 = lid, growing downward); exported bottom-up for viewing.
    """
    velocity = np.asarray(velocity)
    rho = np.asarray(rho)
    flip = lambda a: a[..., ::-1]  # top-down index -> bottom-up VTK y
    vel3 = np.stack([
        flip(velocity[0]),
        flip(velocity[1]),
        np.zeros_like(velocity[0]),
    ]).astype(np.float32)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{prefix}.{save_number}")
    return write_vtr(
        path,
        {"velocity": vel3, "pressure": flip(rho).astype(np.float32)},
    )
