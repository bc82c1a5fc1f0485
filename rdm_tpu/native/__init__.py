"""ctypes bindings for the native CR3BP oracle (``cr3bp_native.cpp``).

The shared library is compiled on demand with ``g++ -O3`` into the package
directory (falling back to a temp dir when the tree is read-only) and
cached; a rebuild triggers whenever the C++ source is newer than the
cached ``.so``.  Binding is plain ctypes — no pybind11 in this image.

Public surface:

* ``available()`` — True when the library could be built+loaded.
* ``propagate(s0, u, throttle, thrust_n, tof, n_steps)`` — single
  constant-control arc, f64 (parity hook against
  ``rdm_tpu.physics.cr3bp.propagate``).
* ``jacobi_energy(state)``.
* ``evaluate_batch(...)`` — propagate-and-check every guess on a
  std::thread pool (native twin of ``oracle.evaluate_warmstarts``).
* ``refine_batch(...)`` — Levenberg-Marquardt "SNOPT-lite" local solve of
  every warm start (the native equivalent of the role pydylan/SNOPT plays
  in the reference, ``cr3bp_...warmstart.py:116-176``).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cr3bp_native.cpp")
_LIB_NAME = "libcr3bp_native.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build(out_path: str) -> None:
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", _SRC, "-o", out_path]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        candidates = [os.path.join(_HERE, _LIB_NAME),
                      os.path.join(tempfile.gettempdir(), _LIB_NAME)]
        for path in candidates:
            try:
                if (not os.path.exists(path)
                        or os.path.getmtime(path) < os.path.getmtime(_SRC)):
                    _build(path)
                lib = ctypes.CDLL(path)
                break
            except (OSError, subprocess.CalledProcessError) as e:
                last = getattr(e, "stderr", None) or str(e)
                continue
        else:
            _build_error = f"native oracle build failed: {last}"
            return None

        D = ctypes.POINTER(ctypes.c_double)
        I = ctypes.POINTER(ctypes.c_int)
        lib.cr3bp_propagate.argtypes = [D, D, ctypes.c_double, ctypes.c_double,
                                        ctypes.c_double, ctypes.c_int, D]
        lib.cr3bp_propagate.restype = None
        lib.cr3bp_jacobi_energy.argtypes = [D]
        lib.cr3bp_jacobi_energy.restype = ctypes.c_double
        lib.cr3bp_evaluate_batch.argtypes = [
            D, D, ctypes.c_int, ctypes.c_int, ctypes.c_double, D,
            ctypes.c_double, ctypes.c_double, D, D, D, ctypes.c_int]
        lib.cr3bp_evaluate_batch.restype = None
        lib.cr3bp_refine_batch.argtypes = [
            D, D, ctypes.c_int, ctypes.c_int, ctypes.c_double, D,
            ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, D, D, D, I, ctypes.c_int]
        lib.cr3bp_refine_batch.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def propagate(s0, u, throttle: float, thrust_n: float, tof: float,
              n_steps: int) -> np.ndarray:
    lib = _load()
    assert lib is not None, _build_error
    s0 = np.ascontiguousarray(s0, np.float64)
    u = np.ascontiguousarray(u, np.float64)
    out = np.empty(7, np.float64)
    lib.cr3bp_propagate(_dptr(s0), _dptr(u), float(throttle), float(thrust_n),
                        float(tof), int(n_steps), _dptr(out))
    return out


def jacobi_energy(state) -> float:
    lib = _load()
    assert lib is not None, _build_error
    s = np.ascontiguousarray(state, np.float64)
    return float(lib.cr3bp_jacobi_energy(_dptr(s)))


def evaluate_batch(guesses, energies, spiral_end, l1x: float, e_l1: float,
                   n_segments: int = 20, thrust: float = 1.0,
                   n_threads: int = 0):
    """Returns (pos_err[N], energy_err[N], final_mass[N])."""
    lib = _load()
    assert lib is not None, _build_error
    g = np.ascontiguousarray(guesses, np.float64)
    e = np.ascontiguousarray(energies, np.float64)
    sp = np.ascontiguousarray(spiral_end, np.float64)
    n = g.shape[0]
    assert g.shape == (n, 66) and e.shape == (n,) and sp.shape == (7,)
    pos = np.empty(n, np.float64)
    ene = np.empty(n, np.float64)
    mass = np.empty(n, np.float64)
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    lib.cr3bp_evaluate_batch(_dptr(g), _dptr(e), n, int(n_segments),
                             float(thrust), _dptr(sp), float(l1x), float(e_l1),
                             _dptr(pos), _dptr(ene), _dptr(mass), n_threads)
    return pos, ene, mass


def refine_batch(guesses, energies, spiral_end, l1x: float, e_l1: float,
                 n_segments: int = 20, thrust: float = 1.0,
                 max_iters: int = 30, tol: float = 1e-3,
                 max_shoot: float = 40.0, max_coast: float = 15.0,
                 n_threads: int = 0):
    """LM-refine every warm start. Returns (refined[N,66], pos_err[N],
    energy_err[N], iters[N]) with errors evaluated AFTER refinement."""
    lib = _load()
    assert lib is not None, _build_error
    g = np.ascontiguousarray(guesses, np.float64)
    e = np.ascontiguousarray(energies, np.float64)
    sp = np.ascontiguousarray(spiral_end, np.float64)
    n = g.shape[0]
    assert g.shape == (n, 66) and e.shape == (n,) and sp.shape == (7,)
    refined = np.empty_like(g)
    pos = np.empty(n, np.float64)
    ene = np.empty(n, np.float64)
    iters = np.empty(n, np.int32)
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    lib.cr3bp_refine_batch(
        _dptr(g), _dptr(e), n, int(n_segments), float(thrust), _dptr(sp),
        float(l1x), float(e_l1), int(max_iters), float(tol), float(max_shoot),
        float(max_coast), _dptr(refined), _dptr(pos), _dptr(ene),
        iters.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads)
    return refined, pos, ene, iters
