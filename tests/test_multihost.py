"""parallel.multihost: env detection and pod-mesh construction.

Runs on the 8-virtual-CPU-device conftest; no real pod needed — the point is
that a regression in ``initialize()``'s detection logic or the mesh
ordering surfaces here instead of on first contact with real hardware.
"""

import numpy as np
import pytest

import jax

from latticeboltzmannsimulations_tpu.parallel import multihost


_CLUSTER_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "TPU_WORKER_HOSTNAMES",
)


def _clear_cluster_env(monkeypatch):
    for v in _CLUSTER_VARS:
        monkeypatch.delenv(v, raising=False)


def test_initialize_noop_without_cluster(monkeypatch):
    """Plain single-process run: no args, no cluster env -> no distributed
    setup attempted (jax.distributed.initialize would raise or hang here)."""
    _clear_cluster_env(monkeypatch)

    def boom(**kwargs):
        raise AssertionError("initialize() must not touch jax.distributed")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    multihost.initialize()  # must return silently


@pytest.mark.parametrize("var", _CLUSTER_VARS)
def test_initialize_detects_cluster_env(monkeypatch, var):
    """Any of the recognized coordinator variables routes through
    jax.distributed.initialize with passthrough arguments."""
    _clear_cluster_env(monkeypatch)
    monkeypatch.setenv(var, "10.0.0.1:8476")
    calls = {}

    def record(coordinator_address=None, num_processes=None, process_id=None):
        calls["args"] = (coordinator_address, num_processes, process_id)

    monkeypatch.setattr(jax.distributed, "initialize", record)
    multihost.initialize()
    assert calls["args"] == (None, None, None)


def test_initialize_explicit_args(monkeypatch):
    _clear_cluster_env(monkeypatch)
    calls = {}

    def record(coordinator_address=None, num_processes=None, process_id=None):
        calls["args"] = (coordinator_address, num_processes, process_id)

    monkeypatch.setattr(jax.distributed, "initialize", record)
    multihost.initialize("host0:1234", num_processes=4, process_id=2)
    assert calls["args"] == ("host0:1234", 4, 2)


def test_initialize_already_initialized(monkeypatch):
    """An existing distributed client short-circuits before any env logic."""
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:8476")

    monkeypatch.setattr(jax.distributed, "is_initialized", lambda: True)

    def boom(**kwargs):
        raise AssertionError("must not re-initialize")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    multihost.initialize()


def test_make_pod_mesh_process_major_x():
    """The x (outer) mesh axis is device-order-major: on a pod that makes x
    host-major, keeping y-halo exchange on intra-host ICI.  On the 8-device
    CPU pool the same invariant is checkable as raster device order."""
    mesh = multihost.make_pod_mesh((4, 2))
    assert mesh.axis_names == ("mx", "my")
    assert mesh.devices.shape == (4, 2)
    flat = [d.id for d in mesh.devices.reshape(-1)]
    assert flat == sorted(flat)  # row-major raster over jax.devices()
    ids = np.asarray([[d.id for d in row] for row in mesh.devices])
    # consecutive device ids (same host first) line up along y (inner axis)
    assert (np.diff(ids, axis=1) == 1).all()
