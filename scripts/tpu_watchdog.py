#!/usr/bin/env python
"""Relay-wedge watchdog for long TPU jobs.

The axon TPU relay can wedge silently: the client process blocks forever in
a remote call, accumulating zero CPU time, and no exception is ever raised
(round 3 lost a 40+ minute training this way, and the one-off recovery lived
in ``resume_eight_y.py``).  This wraps ANY command, watches the child's
cumulative CPU time and its output stream, and when BOTH stop advancing for
``--stall-seconds`` it kills that specific PID (never pattern-matched) and
restarts the command.  The wrapped job must therefore be resumable /
idempotent — e.g. skip components whose weights already exist on disk, the
pattern all ``scripts/train_*.py`` jobs follow.

Usage:
    python scripts/tpu_watchdog.py [--stall-seconds 900] [--max-restarts 3]
        [--poll 30] [--total-timeout 0] --log /tmp/job.log -- \
        python scripts/train_full.py --only cnn_three

Exit code: the child's exit code on clean exit, 97 when restarts are
exhausted, 98 on total timeout, 99 when a wedged child would not die
(restarting would put a second process on the TPU).
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

_CLK = os.sysconf("SC_CLK_TCK")


def _cpu_seconds(pid: int) -> float | None:
    """Cumulative utime+stime of *pid* in seconds, or None if it is gone."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as fh:
            data = fh.read().decode("ascii", "replace")
    except OSError:
        return None
    # Fields after the (possibly space-containing) comm field in parens.
    rest = data.rsplit(")", 1)[1].split()
    utime, stime = int(rest[11]), int(rest[12])  # stat fields 14, 15
    return (utime + stime) / _CLK


def _kill_child(child: subprocess.Popen, log) -> bool:
    """Terminate exactly this child: TERM, grace, then KILL.

    Death is confirmed by *reaping* through the Popen handle — a killed but
    unreaped child remains a zombie whose ``/proc/<pid>/stat`` stays
    readable, so /proc is not usable as an aliveness check here.  Returns
    True iff the child was reaped; False means it is genuinely unkillable
    (e.g. D-state against the wedged relay) and a restart would put a second
    process on the TPU.
    """
    for sig, grace in ((signal.SIGTERM, 10.0), (signal.SIGKILL, 5.0)):
        try:
            child.send_signal(sig)
        except ProcessLookupError:
            pass
        try:
            child.wait(timeout=grace)
            return True
        except subprocess.TimeoutExpired:
            log(f"pid {child.pid} survived {sig.name}; escalating")
    return False


def run_with_watchdog(cmd, log_path, stall_seconds=900.0, max_restarts=3,
                      poll=30.0, total_timeout=0.0):
    t_start = time.monotonic()
    logf = open(log_path, "ab", buffering=0)

    def log(msg: str) -> None:
        line = f"[watchdog {time.monotonic() - t_start:8.1f}s] {msg}\n"
        sys.stderr.write(line)
        sys.stderr.flush()
        logf.write(line.encode())

    for restart in range(max_restarts + 1):
        if restart:
            log(f"restart {restart}/{max_restarts}: {' '.join(cmd)}")
        child = subprocess.Popen(cmd, stdout=logf, stderr=logf)
        log(f"launched pid {child.pid}")
        last_cpu = -1.0
        last_size = -1
        last_progress = time.monotonic()
        wedged = False
        while True:
            try:
                child.wait(timeout=poll)
                break  # exited on its own
            except subprocess.TimeoutExpired:
                pass
            now = time.monotonic()
            if total_timeout and now - t_start > total_timeout:
                log("total timeout exceeded; killing child")
                if not _kill_child(child, log):
                    log("child unkillable at total timeout; rc=99 so "
                        "callers know the TPU may still be held")
                    return 99
                return 98
            cpu = _cpu_seconds(child.pid)
            size = os.fstat(logf.fileno()).st_size
            if cpu is None:
                break  # exited between wait() and the probe
            if cpu > last_cpu + 0.5 or size != last_size:
                last_cpu, last_size, last_progress = cpu, size, now
            elif now - last_progress > stall_seconds:
                log(f"WEDGE: pid {child.pid} cpu stuck at {cpu:.1f}s and no "
                    f"output for {now - last_progress:.0f}s; killing")
                if not _kill_child(child, log):
                    log("child unkillable (D-state against the relay?); "
                        "NOT restarting — a restart would run two TPU "
                        "processes concurrently")
                    return 99
                wedged = True
                break
        if not wedged:
            rc = child.wait()
            if rc == 0:
                log(f"child exited cleanly (rc=0)")
                return 0
            log(f"child exited rc={rc}; not a wedge — not restarting")
            return rc
        # wedged: loop restarts (the relay usually answers a fresh process)
        time.sleep(10)
    log("restarts exhausted")
    return 97


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--stall-seconds", type=float, default=900.0,
                    help="no CPU-time AND no output advance for this long "
                         "=> wedge (default 900; Mosaic compiles of new "
                         "shapes can take ~5 min of client-side idling)")
    ap.add_argument("--max-restarts", type=int, default=3)
    ap.add_argument("--poll", type=float, default=30.0)
    ap.add_argument("--total-timeout", type=float, default=0.0,
                    help="hard wall-clock cap in seconds (0 = none)")
    ap.add_argument("--log", required=True,
                    help="file receiving child stdout/stderr + watchdog notes")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- command to run")
    args = ap.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (use: ... --log F -- python job.py)")
    return run_with_watchdog(cmd, args.log, args.stall_seconds,
                             args.max_restarts, args.poll, args.total_timeout)


if __name__ == "__main__":
    sys.exit(main())
