"""CLI + high-level driver: a tiny cavity run end-to-end through `run`,
producing metrics/plots/VTK/checkpoints; resume works."""

import json
import os

import numpy as np
import pytest

from latticeboltzmannsimulations_tpu.cli import main
from latticeboltzmannsimulations_tpu.config import SimConfig
from latticeboltzmannsimulations_tpu.sim import SimOptions, simulate


def test_cli_run_full_outputs(tmp_path, capsys):
    out = str(tmp_path / "o")
    rc = main([
        "run", "--nx", "48", "--re", "100", "--collision", "srt",
        "--max-steps", "300", "--interval", "100", "--out", out,
        "--plots", "--vtk", "--checkpoint-every", "100",
        "--backend", "jit", "--precision", "float32",
    ])
    assert rc == 0
    files = os.listdir(out)
    assert any(f.endswith(".jsonl") for f in files)
    assert any(f.endswith(".png") for f in files)
    assert any(f.endswith(".vtr") for f in files)
    assert os.path.isdir(os.path.join(out, "ckpt"))
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["steps"] == 300 and summary["mlups"] > 0


def test_simulate_resume(tmp_path):
    cfg = SimConfig(nx=48, ny=48, reynolds=100.0, collision="srt",
                    max_steps=200, report_interval=100, precision="float32")
    out = str(tmp_path)
    s1 = simulate(cfg, SimOptions(out_dir=out, checkpoint_every=100,
                                  backend="jit", verbose=False,
                                  metrics_jsonl=False))
    ckpts = sorted(os.listdir(os.path.join(out, "ckpt")))
    assert ckpts
    # resume from the last checkpoint and run further
    cfg2 = SimConfig(nx=48, ny=48, reynolds=100.0, collision="srt",
                     max_steps=400, report_interval=100, precision="float32")
    s2 = simulate(cfg2, SimOptions(
        out_dir=out, backend="jit", verbose=False, metrics_jsonl=False,
        resume_from=os.path.join(out, "ckpt", ckpts[-1])))
    assert s2.steps == 400


def test_simulate_sharded_backend(tmp_path):
    cfg = SimConfig(nx=32, ny=32, reynolds=100.0, collision="srt",
                    max_steps=100, report_interval=50,
                    mesh_shape=(2, 2))
    s = simulate(cfg, SimOptions(out_dir=str(tmp_path), verbose=False,
                                 metrics_jsonl=False))
    assert s.steps == 100 and np.isfinite(s.mlups)


def test_simulate_divergence_capped_restores(tmp_path):
    """An unstable config diverges deterministically: the driver restores the
    last good checkpoint once, then raises instead of looping forever."""
    # omega close to 2 -> unstable at this Re/grid
    cfg = SimConfig(nx=32, ny=32, reynolds=200000.0, collision="srt",
                    max_steps=100000, report_interval=500,
                    precision="float32", convergence_tol=0.0)
    with pytest.raises(FloatingPointError):
        simulate(cfg, SimOptions(out_dir=str(tmp_path), verbose=False,
                                 metrics_jsonl=False, checkpoint_every=500,
                                 backend="jit"))


def test_simulate_profile_trace(tmp_path):
    cfg = SimConfig(nx=32, ny=32, reynolds=100.0, max_steps=100,
                    report_interval=50, precision="float32")
    prof = str(tmp_path / "prof")
    simulate(cfg, SimOptions(out_dir=str(tmp_path), verbose=False,
                             metrics_jsonl=False, backend="jit",
                             profile_dir=prof))
    assert os.path.isdir(prof) and os.listdir(prof)
