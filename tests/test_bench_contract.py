"""Driver contract for ``bench.py``: the round harness runs it and records
stdout, so it MUST print exactly one JSON line with the agreed keys and
exit 0 — even with no TPU (the labeled CPU-fallback path).  Pinned here in
a subprocess because the contract is the *process* behavior (env handling,
re-exec fallback, single-line stdout), not a function's return value.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_prints_one_json_record_on_cpu_fallback():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU hook -> CPU path
    env.update({
        "JAX_PLATFORMS": "cpu",
        "_LBM_BENCH_CPU_FALLBACK": "1",   # skip the relay probe entirely
        "LBM_BENCH_N": "64",
        "LBM_BENCH_CHUNK": "5",
        "LBM_BENCH_CHUNKS": "1",
    })
    out = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py")],
        env=env, capture_output=True, text=True, timeout=600, cwd=root,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}, rec
    assert rec["unit"] == "MLUPS" and rec["value"] > 0, rec
    assert "64x64" in rec["metric"], rec
