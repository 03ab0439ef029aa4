"""Native (C++) runtime tier: build-on-demand + ctypes bindings.

The reference's native tier is the P3 Fortran library built by CMake
(model/modules/helpers/microphysics_p3/CMakeLists.txt) and called through
bind(C) (microphysics_p3.h:7-30).  Here the native tier is C++ compiled
on demand with the system toolchain into a cached shared object, and bound
with ctypes; JAX reaches it through ``jax.pure_callback`` (host execution,
the analog of the reference's host-staged Fortran call).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

__all__ = ["load_p3_library", "native_available"]

_SRC_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "_build")
_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _build(src: str, out: str) -> None:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           src, "-o", out]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def load_p3_library():
    """Build (once) and load the P3 native kernels; raises RuntimeError with
    the compiler output if the toolchain is unavailable."""
    global _lib, _build_error
    with _lock:
        if _lib is not None:
            return _lib
        if _build_error is not None:
            raise RuntimeError(_build_error)
        src = os.path.abspath(os.path.join(_SRC_DIR, "p3_kernels.cpp"))
        # Cache keyed on a hash of the source (mtimes are unreliable across
        # clones) so a stale binary can never shadow edited source.
        with open(src, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        out = os.path.join(_CACHE_DIR, f"libp3_kernels-{tag}.so")
        try:
            if not os.path.exists(out):
                _build(src, out)
            lib = ctypes.CDLL(out)
        except (subprocess.CalledProcessError, OSError) as e:
            msg = getattr(e, "stderr", "") or str(e)
            _build_error = f"native P3 build failed: {msg}"
            raise RuntimeError(_build_error) from e

        dp = ctypes.POINTER(ctypes.c_double)
        lib.p3_adjust_state.argtypes = [ctypes.c_int64] + [dp] * 5
        lib.p3_adjust_state.restype = None
        lib.p3_column_step.argtypes = (
            [ctypes.c_int64, ctypes.c_int64, ctypes.c_double] + [dp] * 18)
        lib.p3_column_step.restype = None
        lib.p3_set_tables.argtypes = [dp] * 5
        lib.p3_set_tables.restype = None
        lib.p3_has_tables.argtypes = []
        lib.p3_has_tables.restype = ctypes.c_int
        _lib = lib
        _maybe_load_tables(lib)
        return lib


def _maybe_load_tables(lib) -> None:
    """Install the P3 lookup tables into the native twin (p3_set_tables):
    the parsed v4.1.1 ice/collection tables + the generated rain tables --
    the C++ analog of p3_init_a/p3_init_b.  Without a table asset the twin
    stays at the continuous tier (matching the table-less JAX path)."""
    try:
        from ..physics.p3_tables import (default_table_path,
                                         generate_rain_tables,
                                         load_p3_tables)
        path = default_table_path()
        if path is None:
            return
        tables = load_p3_tables(path)
        vn, vm, revap = generate_rain_tables()
        ice = np.ascontiguousarray(tables.ice, np.float64)
        coll = np.ascontiguousarray(tables.collect, np.float64)
        vn = np.ascontiguousarray(vn, np.float64)
        vm = np.ascontiguousarray(vm, np.float64)
        revap = np.ascontiguousarray(revap, np.float64)
        lib.p3_set_tables(_ptr(ice), _ptr(coll), _ptr(vn), _ptr(vm),
                          _ptr(revap))
    except Exception:  # pragma: no cover - table-less operation is valid
        pass


def native_available() -> bool:
    try:
        load_p3_library()
        return True
    except RuntimeError:
        return False


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def p3_adjust_state_native(rho, rho_d, rho_v, rho_c, temp):
    """numpy wrapper: returns (rho_v, rho_c, temp) adjusted."""
    lib = load_p3_library()
    rho = np.ascontiguousarray(rho, np.float64)
    rho_d = np.ascontiguousarray(rho_d, np.float64)
    rv = np.ascontiguousarray(rho_v, np.float64).copy()
    rc = np.ascontiguousarray(rho_c, np.float64).copy()
    t = np.ascontiguousarray(temp, np.float64).copy()
    lib.p3_adjust_state(rho.size, _ptr(rho), _ptr(rho_d), _ptr(rv), _ptr(rc),
                        _ptr(t))
    return rv, rc, t


def p3_column_step_native(qc, nc, qr, nr, qi, ni, qm, bm, qv, theta, exner,
                          pres, rho_d, dz, dt, qv_prev=None, t_prev=None):
    """numpy wrapper over (ncol, nz) arrays; returns the updated prognostics
    plus (precip_liq, precip_ice) of shape (ncol,).  ``qv_prev``/``t_prev``
    feed evaporate_rain's supersaturation history (None = first step)."""
    lib = load_p3_library()
    arrs = [np.ascontiguousarray(a, np.float64).copy()
            for a in (qc, nc, qr, nr, qi, ni, qm, bm, qv, theta)]
    ro = [np.ascontiguousarray(a, np.float64)
          for a in (exner, pres, rho_d, dz)]
    hist = [np.ascontiguousarray(a, np.float64) if a is not None else None
            for a in (qv_prev, t_prev)]
    ncol, nz = arrs[0].shape
    pl = np.zeros(ncol, np.float64)
    pi_ = np.zeros(ncol, np.float64)
    null = ctypes.POINTER(ctypes.c_double)()
    lib.p3_column_step(ncol, nz, float(dt),
                       *[_ptr(a) for a in arrs], *[_ptr(a) for a in ro],
                       *[_ptr(a) if a is not None else null for a in hist],
                       _ptr(pl), _ptr(pi_))
    return (*arrs, pl, pi_)
