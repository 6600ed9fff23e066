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

    # Build appended block (raw encoding: each array prefixed by u32 length).
    blobs = []
    offsets = []
    off = 0
    def append(a: np.ndarray):
        nonlocal off
        raw = np.ascontiguousarray(a).tobytes()
        blobs.append(struct.pack("<I", len(raw)) + raw)
        offsets.append(off)
        off += 4 + len(raw)

    for a in (xs, ys, zs):
        append(a)
    arrays = []
    for name, arr in cell_data.items():
        arr = np.asarray(arr)
        ncomp = arr.shape[0] if arr.ndim == 3 else 1
        flat = _flatten_cellwise(arr)
        arrays.append((name, ncomp, _VTK_TYPES[flat.dtype]))
        append(flat)

    extent = f"0 {nx} 0 {ny} 0 0"
    lines = [
        '<?xml version="1.0"?>',
        '<VTKFile type="RectilinearGrid" version="1.0" '
        'byte_order="LittleEndian" header_type="UInt32">',
        f'  <RectilinearGrid WholeExtent="{extent}">',
        f'    <Piece Extent="{extent}">',
        "      <Coordinates>",
    ]
    for i, (nm, a) in enumerate((("x", xs), ("y", ys), ("z", zs))):
        lines.append(
            f'        <DataArray type="Float64" Name="{nm}" '
            f'NumberOfComponents="1" format="appended" offset="{offsets[i]}"/>'
        )
    lines.append("      </Coordinates>")
    lines.append("      <CellData>")
    for (name, ncomp, vtype), o in zip(arrays, offsets[3:]):
        lines.append(
            f'        <DataArray type="{vtype}" Name="{name}" '
            f'NumberOfComponents="{ncomp}" format="appended" offset="{o}"/>'
        )
    lines += [
        "      </CellData>",
        "    </Piece>",
        "  </RectilinearGrid>",
        '  <AppendedData encoding="raw">',
    ]
    header = "\n".join(lines) + "\n_"
    footer = "\n  </AppendedData>\n</VTKFile>\n"

    with open(path, "wb") as fh:
        fh.write(header.encode())
        for b in blobs:
            fh.write(b)
        fh.write(footer.encode())
    return path


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
