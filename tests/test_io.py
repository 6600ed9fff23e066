"""I/O layer: VTK writer round-trip (parsed back from the raw format),
checkpoint save/restore identity, metrics JSONL."""

import json
import os
import struct
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from latticeboltzmannsimulations_tpu import engine
from latticeboltzmannsimulations_tpu.config import SimConfig
from latticeboltzmannsimulations_tpu.io import (
    Checkpointer,
    MetricsLogger,
    load_checkpoint,
    save_checkpoint,
    save_to_vtk,
    write_vtr,
)


def _read_vtr(path):
    """Minimal raw-appended .vtr reader for round-trip checks."""
    blob = open(path, "rb").read()
    head, _, rest = blob.partition(b'<AppendedData encoding="raw">')
    data = rest.split(b"_", 1)[1]
    xml = head.decode() + "<AppendedData></AppendedData></VTKFile>"
    tree = ET.fromstring(xml)
    arrays = {}
    for da in tree.iter("DataArray"):
        off = int(da.get("offset"))
        n = struct.unpack_from("<I", data, off)[0]
        raw = data[off + 4 : off + 4 + n]
        dt = {"Float32": "<f4", "Float64": "<f8"}[da.get("type")]
        arrays[da.get("Name")] = (
            np.frombuffer(raw, dtype=dt),
            int(da.get("NumberOfComponents")),
        )
    return tree, arrays


def test_write_vtr_roundtrip(tmp_path):
    nx, ny = 6, 4
    rho = np.arange(nx * ny, dtype=np.float32).reshape(nx, ny)
    vel = np.stack([rho, -rho, np.zeros_like(rho)])
    path = write_vtr(str(tmp_path / "t"), {"velocity": vel, "pressure": rho})
    tree, arrays = _read_vtr(path)

    piece = next(tree.iter("Piece"))
    assert piece.get("Extent") == f"0 {nx} 0 {ny} 0 0"
    p, ncomp = arrays["pressure"]
    assert ncomp == 1
    np.testing.assert_array_equal(p.reshape(ny, nx).T, rho)  # F-order cells
    v, ncomp = arrays["velocity"]
    assert ncomp == 3
    v = v.reshape(-1, 3)
    np.testing.assert_array_equal(v[:, 0].reshape(ny, nx).T, rho)
    np.testing.assert_array_equal(v[:, 1].reshape(ny, nx).T, -rho)
    np.testing.assert_array_equal(v[:, 2], 0.0)


def test_save_to_vtk_facade(tmp_path):
    nx, ny = 8, 8
    u = np.zeros((2, nx, ny), np.float32)
    u[0, :, 0] = 0.08  # lid row (y index 0)
    rho = np.ones((nx, ny), np.float32)
    path = save_to_vtk(u, rho, "cav", 3, out_dir=str(tmp_path))
    assert path.endswith("cav.3.vtr") and os.path.exists(path)
    _, arrays = _read_vtr(path)
    v = arrays["velocity"][0].reshape(-1, 3)
    # lid row exported at the TOP (last y row after the bottom-up flip)
    vx = v[:, 0].reshape(ny, nx)
    assert np.all(vx[-1] == np.float32(0.08)) and np.all(vx[:-1] == 0)


def test_checkpoint_roundtrip(tmp_path):
    cfg = SimConfig(nx=32, ny=32, reynolds=100.0)
    state = engine.init_state(cfg)
    step = jax_step = engine.make_fused_step(cfg)
    state = step(state)
    path = save_checkpoint(str(tmp_path / "ck"), state, 1, cfg)
    restored, n = load_checkpoint(path, cfg)
    assert n == 1
    np.testing.assert_array_equal(np.asarray(restored.f), np.asarray(state.f))

    # wrong config is rejected
    with pytest.raises(ValueError):
        load_checkpoint(path, SimConfig(nx=32, ny=32, reynolds=400.0))


def test_checkpointer_keeps_last_k(tmp_path):
    cfg = SimConfig(nx=32, ny=32, reynolds=100.0)
    state = engine.init_state(cfg)
    ck = Checkpointer(str(tmp_path), cfg, every=10, keep=2)
    rho, u = engine.observables(cfg, state)
    for s in (10, 20, 30):
        ck(s, state, rho, u)
    files = sorted(p for p in os.listdir(tmp_path) if p.endswith(".npz"))
    assert len(files) == 2 and files[-1] == "ckpt_00000030.npz"
    restored, n = ck.restore_last_good()
    assert n == 30


def test_checkpointer_saves_when_every_not_multiple_of_interval(tmp_path):
    # simulate() invokes the callback at report-interval multiples; an
    # ``every`` that's not a multiple of the interval must still save.
    cfg = SimConfig(nx=32, ny=32, reynolds=100.0)
    state = engine.init_state(cfg)
    ck = Checkpointer(str(tmp_path), cfg, every=75, keep=3)
    rho, u = engine.observables(cfg, state)
    for s in (50, 100, 150, 200):
        ck(s, state, rho, u)
    files = sorted(p for p in os.listdir(tmp_path) if p.endswith(".npz"))
    assert files == ["ckpt_00000100.npz", "ckpt_00000200.npz"]


def test_checkpointer_resume_seeds_save_clock(tmp_path):
    # After a resume, the save clock must measure from the resume step, not
    # step 0 — otherwise the first interval callback re-saves immediately
    # even when a checkpoint was just written before the restart.
    cfg = SimConfig(nx=32, ny=32, reynolds=100.0)
    state = engine.init_state(cfg)
    ck = Checkpointer(str(tmp_path), cfg, every=100, keep=2, start_step=500)
    rho, u = engine.observables(cfg, state)
    ck(550, state, rho, u)   # only 50 steps since resume: no save
    assert not [p for p in os.listdir(tmp_path) if p.endswith(".npz")]
    ck(600, state, rho, u)   # 100 steps since resume: saves
    files = [p for p in os.listdir(tmp_path) if p.endswith(".npz")]
    assert files == ["ckpt_00000600.npz"]


def test_checkpointer_never_persists_diverged_state(tmp_path):
    """Blow-up recovery (code-review r4): a non-finite state must not be
    written at all — a fresh process's cold scan takes the NEWEST file, so
    a persisted NaN checkpoint would be restored as 'last good' — and the
    save clock must rewind on restore so the replay window is protected."""
    cfg = SimConfig(nx=32, ny=32, reynolds=100.0)
    state = engine.init_state(cfg)
    rho, u = engine.observables(cfg, state)
    bad_u = np.asarray(u).copy()
    bad_u[0, 5, 5] = np.nan

    ck = Checkpointer(str(tmp_path), cfg, every=100, keep=2)
    ck(100, state, rho, u)       # good
    ck(200, state, rho, bad_u)   # diverged: must not be persisted
    files = [p for p in os.listdir(tmp_path) if p.endswith(".npz")]
    assert files == ["ckpt_00000100.npz"]

    # a FRESH process (cold scan) restores the good checkpoint...
    ck2 = Checkpointer(str(tmp_path), cfg, every=100, keep=2)
    restored, step = ck2.restore_last_good()
    assert step == 100
    # ...and its save clock is rewound to the restore point, so the replay
    # window gets checkpointed again on schedule
    ck2(200, restored, rho, u)
    files = sorted(p for p in os.listdir(tmp_path) if p.endswith(".npz"))
    assert files == ["ckpt_00000100.npz", "ckpt_00000200.npz"]


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    with MetricsLogger(path) as m:
        m.log(100, mean_u=0.01, r2=0.98)
        m.log(200, mean_u=0.011)
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 100 and lines[0]["r2"] == 0.98
    assert lines[1]["step"] == 200


def test_dashboard_renders(tmp_path):
    from latticeboltzmannsimulations_tpu import viz

    cfg = SimConfig(nx=48, ny=48, reynolds=100.0, max_steps=200,
                    report_interval=100)
    res = engine.run_to_convergence(cfg)
    rho, u = engine.observables(cfg, res.state)
    png = viz.dashboard(cfg, np.asarray(rho), np.asarray(u), res.steps,
                        r2_history=[(100, 0.5), (200, 0.8)],
                        out_dir=str(tmp_path))
    assert os.path.exists(png) and os.path.getsize(png) > 10000


def test_write_vti_and_vtp(tmp_path):
    from latticeboltzmannsimulations_tpu.io import write_vti, write_vtp_points

    rho = np.arange(12, dtype=np.float32).reshape(4, 3)
    p = write_vti(str(tmp_path / "img"), {"pressure": rho}, spacing=(0.5, 0.5))
    blob = open(p, "rb").read()
    assert b'<VTKFile type="ImageData"' in blob
    data = blob.split(b'encoding="raw">', 1)[1].split(b"_", 1)[1]
    n = struct.unpack_from("<I", data, 0)[0]
    vals = np.frombuffer(data[4 : 4 + n], dtype="<f4")
    np.testing.assert_array_equal(vals.reshape(3, 4).T, rho)

    p2 = write_vtp_points(
        str(tmp_path / "pts"), np.array([0.1, 0.9]), np.array([0.2, 0.8]),
        {"speed": np.array([1.0, 2.0])})
    blob = open(p2, "rb").read()
    assert b'<VTKFile type="PolyData"' in blob and b'NumberOfPoints="2"' in blob
