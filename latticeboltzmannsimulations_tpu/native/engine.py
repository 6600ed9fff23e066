"""ctypes binding + on-demand build of the native C++ engine.

Mirrors ``engine.make_fused_step`` semantics on the host CPU: state is
``(f, rho_lid)``, N steps per call, OpenMP across columns.  Used as a fast
host-side backend and as an independent implementation to cross-check the
JAX engines (see ``tests/test_native.py``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from ..config import SimConfig

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "lbm_kernel.cpp")
_LIB_PATH = os.path.join(_HERE, "_lbm_native.so")
_COLLISION = {"srt": 0, "trt": 1, "mrt": 2}

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    """Compile the shared library; returns an error string on failure."""
    cmd = [
        "g++", "-O3", "-march=native", "-ffast-math", "-fopenmp",
        "-shared", "-fPIC", _SRC, "-o", _LIB_PATH,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:  # no compiler
        return str(e)
    if proc.returncode:
        return proc.stderr
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            return None
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            err = _build()
            if err:
                _build_error = err
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.lbm_run.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_float,
        ]
        lib.lbm_run.restype = None
        lib.lbm_num_threads.restype = ctypes.c_int
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def num_threads() -> int:
    lib = _load()
    return int(lib.lbm_num_threads()) if lib else 0


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def native_run(
    cfg: SimConfig,
    f: np.ndarray,
    rho_lid: np.ndarray,
    n_steps: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Advance (f, rho_lid) by ``n_steps`` fused steps on the CPU."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native engine unavailable: {_build_error}")
    f = np.ascontiguousarray(f, dtype=np.float32)
    rho_lid = np.ascontiguousarray(rho_lid, dtype=np.float32)
    f_out = np.empty_like(f)
    lid_out = np.empty_like(rho_lid)
    lib.lbm_run(
        _ptr(f), _ptr(rho_lid), _ptr(f_out), _ptr(lid_out),
        cfg.nx, cfg.ny, n_steps,
        ctypes.c_float(cfg.omega), ctypes.c_float(cfg.u_lid),
        _COLLISION[cfg.collision], ctypes.c_float(cfg.trt_magic),
        ctypes.c_float(cfg.mrt_omega_e), ctypes.c_float(cfg.mrt_omega_eps),
        ctypes.c_float(cfg.mrt_omega_q),
        1 if cfg.turbulence == "smagorinsky" else 0,
        ctypes.c_float(cfg.smagorinsky_cs2),
    )
    return f_out, lid_out


class NativeEngine:
    """Stateful convenience wrapper mirroring the JAX scan runner."""

    def __init__(self, cfg: SimConfig):
        cfg.validate()
        if not is_available():
            raise RuntimeError(f"native engine unavailable: {_build_error}")
        self.cfg = cfg
        from .. import engine as jax_engine

        st = jax_engine.init_state(cfg)
        self.f = np.asarray(st.f, dtype=np.float32)
        self.rho_lid = np.asarray(st.rho_lid, dtype=np.float32)

    def run(self, n_steps: int) -> "NativeEngine":
        self.f, self.rho_lid = native_run(
            self.cfg, self.f, self.rho_lid, n_steps)
        return self

    def observables(self) -> Tuple[np.ndarray, np.ndarray]:
        import jax.numpy as jnp

        from .. import engine as jax_engine

        rho, u = jax_engine.observables(
            self.cfg,
            jax_engine.State(f=jnp.asarray(self.f),
                             rho_lid=jnp.asarray(self.rho_lid)),
        )
        return np.asarray(rho), np.asarray(u)
