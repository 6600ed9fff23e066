"""Budget-cut-safe dataset sweeps: bit-reversed batch ordering and partial
assembly (``scripts/datagen_full.py --assemble-partial``).

A time-bounded sweep used to leave only low-Re chunks and no assembled
dataset at all; these tests pin the two pieces that make a cut-off sweep
usable: any prefix of the reordered batch sequence spans the whole Re range,
and assembly from an incomplete chunk set yields a well-formed (subset)
4-file layout plus quarantine mask."""

import os
import subprocess
import sys

import numpy as np

from latticeboltzmannsimulations_tpu.ml import datagen

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bit_reversed_batches_is_a_permutation():
    vals = np.arange(100.0, 5100.0, 10.0)
    out = datagen.bit_reversed_batches(vals, 7)
    assert len(out) == len(vals)
    assert set(out.tolist()) == set(vals.tolist())
    # the consumer re-slices into ALIGNED 7-groups: every aligned group
    # must be a consecutive Re run (the short 500 % 7 = 3 batch must be
    # last, or it would shift every later slice boundary and mix Re values
    # thousands apart in one vmapped batch)
    for i in range(0, len(out), 7):
        grp = out[i:i + 7]
        assert np.allclose(np.diff(grp), 10.0), (i, grp)
    assert len(out) % 7 == 3 and np.allclose(out[-3:], vals[-3:])


def test_bit_reversed_prefix_covers_range():
    vals = np.arange(100.0, 5100.0, 10.0)
    out = datagen.bit_reversed_batches(vals, 7)
    # after only 1/4 of the sweep, the largest uncovered gap should be a
    # small fraction of the range (ascending order would leave 3/4 of the
    # range untouched)
    quarter = out[: len(out) // 4]
    got = np.sort(quarter)
    gaps = np.diff(np.concatenate([[vals[0]], got, [vals[-1]]]))
    assert gaps.max() < (vals[-1] - vals[0]) / 8


def test_bit_reversed_single_batch():
    vals = np.arange(5)
    out = datagen.bit_reversed_batches(vals, 8)
    assert np.array_equal(out, vals)


def test_assemble_partial(tmp_path):
    g, bs = 16, 3
    re_all = np.arange(100.0, 190.0, 10.0)  # 9 values -> 3 batches
    chunk_dir = tmp_path / "chunks"
    chunk_dir.mkdir()
    rng = np.random.default_rng(0)
    # two of three batches present (the middle one "never ran"); one cavity
    # quarantined
    for lo in (100.0, 160.0):
        re = np.arange(lo, lo + bs * 10.0, 10.0)
        failed = np.zeros(bs, bool)
        if lo == 160.0:
            failed[1] = True
        np.savez_compressed(
            chunk_dir / f"re{lo:08.1f}.npz", re=re,
            f_final=rng.random((bs, 9, g, g), np.float32) + 0.5,
            u_final=rng.random((bs, 2, g, g), np.float32),
            steps=1000, converged=np.ones(bs, bool), failed=failed,
        )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU-tunnel registration
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "datagen_full.py"),
         "--assemble-partial", "--grid", str(g), "--re-start", "100",
         "--re-stop", "190", "--re-step", "10", "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    ds = datagen.load_dataset(str(tmp_path))
    assert ds.re_range.tolist() == [100.0, 110.0, 120.0, 160.0, 170.0, 180.0]
    assert ds.f_final.shape == (6, 9, g, g)
    assert ds.u_final.shape == (6, 2, g, g)
    assert ds.failed is not None and ds.failed.tolist() == [
        False, False, False, False, True, False]
    # quarantined slots never reach training
    kept = datagen.drop_failed(ds)
    assert 170.0 not in kept.re_range


def test_assemble_partial_no_chunks(tmp_path):
    (tmp_path / "chunks").mkdir()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "datagen_full.py"),
         "--assemble-partial", "--grid", "16", "--re-start", "100",
         "--re-stop", "130", "--re-step", "10", "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 1
