"""I/O layer (L5): VTK export, checkpoint/restore, structured metrics.

Capability parity with the reference's ``VTKWrapper.saveToVTK`` + vendored
``pyevtk`` binary writer and its ``.npy`` dataset dumps (SURVEY.md §2.5),
plus the checkpoint/resume and metrics subsystems the reference lacks
(SURVEY.md §5)."""

from .vtk import save_to_vtk, write_vtr, write_vti, write_vtp_points
from .checkpoint import (
    Checkpointer,
    load_checkpoint,
    save_checkpoint,
)
from .metrics import MetricsLogger

__all__ = [
    "save_to_vtk",
    "write_vtr",
    "write_vti",
    "write_vtp_points",
    "Checkpointer",
    "save_checkpoint",
    "load_checkpoint",
    "MetricsLogger",
]
