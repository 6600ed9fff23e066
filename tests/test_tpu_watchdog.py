"""The relay-wedge watchdog detects a stalled child, kills it by PID, and
restarts the (resumable) command until it completes."""

import os
import subprocess
import sys
import textwrap


def _run(tmp_path, job_body, **kw):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import tpu_watchdog

    job = tmp_path / "job.py"
    job.write_text(textwrap.dedent(job_body))
    log = tmp_path / "job.log"
    rc = tpu_watchdog.run_with_watchdog(
        [sys.executable, str(job), str(tmp_path)], str(log), **kw)
    return rc, log.read_text()


def test_wedge_then_resume(tmp_path):
    """First run wedges (silent sleep); the restart finds the marker file
    from the first run's completed portion and finishes cleanly."""
    rc, log = _run(
        tmp_path,
        """
        import pathlib, sys, time
        root = pathlib.Path(sys.argv[1])
        marker = root / "phase1.done"
        if marker.exists():
            print("resumed; finishing", flush=True)
            sys.exit(0)
        marker.write_text("done")
        time.sleep(3600)  # simulated relay wedge: no cpu, no output
        """,
        stall_seconds=3.0, poll=1.0, max_restarts=2,
    )
    assert rc == 0
    assert "WEDGE" in log
    assert "resumed; finishing" in log


def test_clean_failure_not_restarted(tmp_path):
    rc, log = _run(
        tmp_path,
        """
        import sys
        print("dying deliberately", flush=True)
        sys.exit(3)
        """,
        stall_seconds=5.0, poll=1.0, max_restarts=2,
    )
    assert rc == 3
    assert "not a wedge" in log
    assert "restart 1" not in log


def test_restarts_exhausted(tmp_path):
    rc, log = _run(
        tmp_path,
        """
        import time
        time.sleep(3600)
        """,
        stall_seconds=2.0, poll=1.0, max_restarts=1,
    )
    assert rc == 97
    assert log.count("WEDGE") == 2


def test_cli_parses(tmp_path):
    proc = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "tpu_watchdog.py"),
         "--stall-seconds", "5", "--poll", "1",
         "--log", str(tmp_path / "cli.log"), "--",
         sys.executable, "-c", "print('ok')"],
        capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 0, proc.stderr
