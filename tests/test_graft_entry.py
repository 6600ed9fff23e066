"""The driver entry points keep working: single-chip compile check and the
multi-chip dry run on the virtual CPU mesh."""

import sys

import jax
import numpy as np


def test_entry_compiles_and_steps():
    sys.path.insert(0, ".")
    import __graft_entry__ as g

    fn, args = g.entry()
    out_f, out_lid = jax.jit(fn)(*args)
    assert out_f.shape == args[0].shape
    assert np.all(np.isfinite(np.asarray(out_f)))


def test_dryrun_multichip():
    sys.path.insert(0, ".")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_survives_dead_backend(monkeypatch, capsys):
    """Forced-dead-relay simulation (MULTICHIP_r03 rc=124 regression).

    On a dead axon relay ``jax.devices()`` hangs inside backend init, so the
    parent process must never call it unless the CPU platform is pinned.  We
    simulate "platform is not local CPU" and make any parent-side
    ``jax.devices()`` call fatal; the dry run must still complete via the
    clean-environment subprocess, well inside the driver's timeout.
    """
    import time

    sys.path.insert(0, ".")
    import __graft_entry__ as g

    def _hang_simulator(*a, **k):  # a hang can't be caught; a call = a bug
        raise AssertionError(
            "parent called jax.devices() on a possibly-dead backend"
        )

    monkeypatch.setattr(jax, "devices", _hang_simulator)
    monkeypatch.setattr(g, "_cpu_platform_selected", lambda: False)
    t0 = time.monotonic()
    g.dryrun_multichip(8)
    elapsed = time.monotonic() - t0
    out = capsys.readouterr().out
    assert "dryrun_multichip ok" in out
    assert elapsed < 300  # driver kills at 600s; subprocess must be far under


def test_entry_pins_cpu_when_relay_dead(monkeypatch, capsys):
    """entry() on a dead relay must pin the process to CPU (so the driver's
    jit compile-check completes) instead of hanging in backend init."""
    sys.path.insert(0, ".")
    import __graft_entry__ as g
    import relay_probe

    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    monkeypatch.setattr(g, "_cpu_platform_selected", lambda: False)
    monkeypatch.setattr(g, "_backend_already_initialized", lambda: False)
    # dead relay = the killable probe reports no answer (its internal
    # timeout/unkillable-child handling is relay_probe's own concern)
    monkeypatch.setattr(relay_probe, "backend_answers",
                        lambda timeout_s=240: False)
    fn, args = g.entry()
    # under conftest the platform was already cpu; the guard must have
    # (re-)pinned it rather than hung, and the step must still run
    assert jax.config.jax_platforms.split(",")[0] == "cpu"
    out_f, _ = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out_f)))
    assert "relay did not answer" in capsys.readouterr().err


def test_relay_probe_kills_hung_child(monkeypatch):
    """A wedged backend-init child must be killed and reported dead, not
    waited on forever (the subprocess.run untimed-wait wedge)."""
    import time

    sys.path.insert(0, ".")
    import relay_probe

    monkeypatch.setattr(relay_probe, "_PROBE", "import time; time.sleep(999)")
    t0 = time.monotonic()
    assert relay_probe.backend_answers(timeout_s=1.5) is False
    assert time.monotonic() - t0 < 30


def test_relay_probe_answers_for_healthy_child(monkeypatch):
    sys.path.insert(0, ".")
    import relay_probe

    monkeypatch.setattr(relay_probe, "_PROBE", "print('ok')")
    assert relay_probe.backend_answers(timeout_s=60) is True


def test_cpu_platform_selected_true_under_conftest():
    """The in-process fast path stays available to the (CPU-pinned) suite."""
    sys.path.insert(0, ".")
    import __graft_entry__ as g

    assert g._cpu_platform_selected()
