"""Killable TPU-relay liveness probe, shared by ``bench.py`` and
``__graft_entry__.py``.

A dead axon relay HANGS jax backend init (it does not raise), so the probe
must run in a subprocess that the caller can abandon.  ``subprocess.run``
is NOT safe here: its ``TimeoutExpired`` handler calls ``kill()`` followed
by an *untimed* ``wait()``, which blocks forever if the child is wedged in
uninterruptible sleep — the exact r3 failure mode ``probe_k24.run_child``
documents.  Hence Popen + bounded ``communicate``, treating an unkillable
child as a dead backend.
"""

from __future__ import annotations

import subprocess
import sys

_PROBE = ("import jax, jax.numpy as jnp, numpy as np; "
          "x = jnp.ones((8, 8)); "
          "print(float(np.asarray((x @ x)[0, 0])))")


def backend_answers(timeout_s: float = 240.0) -> bool:
    """True iff a fresh subprocess can initialize the default jax backend
    and execute one tiny dispatch within ``timeout_s``.

    The child's stderr is captured and its tail surfaced on failure, so a
    probe that fails for a non-relay reason (import error, OOM) is
    distinguishable from a hung relay in the caller's log (ADVICE r4: the
    DEVNULL version made BENCH_r03-style postmortems evidence-free)."""
    proc = subprocess.Popen(
        [sys.executable, "-c", _PROBE],
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, text=True,
    )
    try:
        _, err = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        proc.kill()
        try:
            proc.communicate(timeout=30)
        except subprocess.TimeoutExpired:
            pass  # unkillable (D-state) child: the backend is dead to us
        print(f"relay probe: child hung past {timeout_s}s (killed)",
              file=sys.stderr, flush=True)
        return False
    if proc.returncode != 0:
        tail = "\n".join((err or "").strip().splitlines()[-8:])
        print(f"relay probe: child exited rc={proc.returncode}; stderr tail:\n"
              f"{tail}", file=sys.stderr, flush=True)
    return proc.returncode == 0
