"""ctypes bindings for the native CR3BP oracle (``cr3bp_native.cpp``).

The shared library is compiled on demand with ``g++ -O3``.  Build targets,
in order: the package directory itself (developer checkout), then a
per-user cache directory (``~/.cache/rdm_tpu/native``, created mode 0700).
The library is compiled to a unique temporary name and atomically
``os.rename``d into place, and ownership is verified before ``CDLL`` — a
shared world-writable location is never used, so another local user can
neither pre-plant nor swap the library (nor can two builds race on a
partially-written file).

Binding is plain ctypes — no pybind11 in this image.

Public surface:

* ``available()`` — True when the library could be built+loaded.
* ``propagate(s0, u, throttle, thrust_n, tof, n_steps)`` — single
  constant-control arc, f64 (parity hook against
  ``rdm_tpu.physics.cr3bp.propagate``).
* ``jacobi_energy(state)``.
* ``manifold_target(seed, period, vstable, tau_frac, length)`` — stable-
  manifold arc end state (parity hook against
  ``rdm_tpu.physics.manifold.manifold_target``).
* ``evaluate_batch(...)`` — forward-backward midpoint defect of every
  guess as-is, on a std::thread pool.
* ``residual_batch(...)`` — the raw [N, 7] residual vectors (the hook
  external solvers build on; ``scripts/second_solver_crosscheck.py``).
* ``refine_batch(...)`` — Levenberg-Marquardt "SNOPT-lite" local solve of
  every warm start against the manifold boundary condition, with the
  optional mass-ascent optimal phase (the native equivalent of the role
  pydylan/SNOPT plays in the reference, ``cr3bp_...warmstart.py:87-224``).

Per-sample halo family data (seed state / period / stable eigenvector at
each sample's energy) is interpolated by the caller from
``rdm_tpu.physics.halo.interp_seed`` and passed in as arrays.
"""
from __future__ import annotations

import ctypes
import os
import stat
import subprocess
import threading
import uuid
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cr3bp_native.cpp")
_LIB_NAME = "libcr3bp_native.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _user_cache_dir() -> str:
    d = os.path.join(os.path.expanduser("~"), ".cache", "rdm_tpu", "native")
    os.makedirs(d, mode=0o700, exist_ok=True)
    return d


def _build_into(directory: str) -> str:
    """Compile to a unique temp name in ``directory`` and atomically
    rename to the canonical library path.  Returns the final path."""
    final = os.path.join(directory, _LIB_NAME)
    tmp = os.path.join(directory, f".{_LIB_NAME}.{uuid.uuid4().hex}.tmp")
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.rename(tmp, final)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return final


def _safe_to_load(path: str) -> bool:
    """Only dlopen libraries owned by this user (or root) that are not
    world-writable and are current w.r.t. the source."""
    try:
        st = os.stat(path)
    except OSError:
        return False
    if st.st_uid not in (os.getuid(), 0):
        return False
    if st.st_mode & stat.S_IWOTH:
        return False
    return st.st_mtime >= os.path.getmtime(_SRC)


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        last = "no build attempted"
        lib = None
        for directory in (_HERE, _user_cache_dir()):
            path = os.path.join(directory, _LIB_NAME)
            try:
                if not _safe_to_load(path):
                    path = _build_into(directory)
                lib = ctypes.CDLL(path)
                break
            except (OSError, subprocess.CalledProcessError) as e:
                last = getattr(e, "stderr", None) or str(e)
                continue
        if lib is None:
            _build_error = f"native oracle build failed: {last}"
            return None

        D = ctypes.POINTER(ctypes.c_double)
        I = ctypes.POINTER(ctypes.c_int)
        c_d, c_i = ctypes.c_double, ctypes.c_int
        lib.cr3bp_propagate.argtypes = [D, D, c_d, c_d, c_d, c_i, D]
        lib.cr3bp_propagate.restype = None
        lib.cr3bp_jacobi_energy.argtypes = [D]
        lib.cr3bp_jacobi_energy.restype = c_d
        lib.cr3bp_manifold_target.argtypes = [D, c_d, D, c_d, c_d, D]
        lib.cr3bp_manifold_target.restype = None
        lib.cr3bp_evaluate_batch.argtypes = [
            D, c_i, c_i, c_d, D,          # guesses, n, n_segments, thrust, spiral
            D, D, D, c_d, c_d,            # halo seeds/periods/vstables, mani bounds
            D, D, D, D, c_i]              # cost, pos, vel, mass, n_threads
        lib.cr3bp_evaluate_batch.restype = None
        lib.cr3bp_residual_batch.argtypes = [
            D, c_i, c_i, c_d, D,          # guesses, n, n_segments, thrust, spiral
            D, D, D, c_d, c_d,            # halo seeds/periods/vstables, mani bounds
            D, c_i]                       # r_out [n,7], n_threads
        lib.cr3bp_residual_batch.restype = None
        lib.cr3bp_refine_batch.argtypes = [
            D, c_i, c_i, c_d, D,          # guesses, n, n_segments, thrust, spiral
            D, D, D, c_d, c_d,            # halo data, mani bounds
            c_i, c_d, c_d, c_d, c_d,      # max_iters, tol, shoot/coast bounds
            c_d, c_d, c_i,                # mass box, optimal
            D, D, D, D, D, D, I, D, D,    # refined, cost, pos, vel, mass, tmass, iters, stat, opt_gain
            c_i]                          # n_threads
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


def manifold_target(seed, period: float, vstable, tau_frac: float,
                    length: float) -> np.ndarray:
    lib = _load()
    assert lib is not None, _build_error
    seed = np.ascontiguousarray(seed, np.float64)
    vs = np.ascontiguousarray(vstable, np.float64)
    out = np.empty(6, np.float64)
    lib.cr3bp_manifold_target(_dptr(seed), float(period), _dptr(vs),
                              float(tau_frac), float(length), _dptr(out))
    return out


def _halo_arrays(halo_energies):
    """Interpolate per-sample halo family data for the C++ oracle."""
    from rdm_tpu.physics import halo as _halo

    sd = _halo.interp_seed(np.asarray(halo_energies, np.float64))
    seeds = np.ascontiguousarray(np.atleast_2d(sd["state0"]), np.float64)
    periods = np.ascontiguousarray(np.atleast_1d(sd["period"]), np.float64)
    vstables = np.ascontiguousarray(np.atleast_2d(sd["vstable"]), np.float64)
    return seeds, periods, vstables


def evaluate_batch(guesses, halo_energies, spiral_end,
                   n_segments: int = 20, thrust: float = 1.0,
                   min_manifold_length: float = 5.0,
                   max_manifold_length: float = 11.0,
                   n_threads: int = 0):
    """Forward-backward defect of every guess as-is.  Returns
    (cost[N], pos_err[N], vel_err[N], final_mass[N])."""
    lib = _load()
    assert lib is not None, _build_error
    g = np.ascontiguousarray(guesses, np.float64)
    sp = np.ascontiguousarray(spiral_end, np.float64)
    n = g.shape[0]
    assert g.shape == (n, 66) and sp.shape == (7,)
    seeds, periods, vstables = _halo_arrays(halo_energies)
    assert seeds.shape == (n, 6) and periods.shape == (n,)
    cost = np.empty(n, np.float64)
    pos = np.empty(n, np.float64)
    vel = np.empty(n, np.float64)
    mass = np.empty(n, np.float64)
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    lib.cr3bp_evaluate_batch(
        _dptr(g), n, int(n_segments), float(thrust), _dptr(sp),
        _dptr(seeds), _dptr(periods), _dptr(vstables),
        float(min_manifold_length), float(max_manifold_length),
        _dptr(cost), _dptr(pos), _dptr(vel), _dptr(mass), n_threads)
    return cost, pos, vel, mass


def residual_batch(guesses, halo_energies, spiral_end,
                   n_segments: int = 20, thrust: float = 1.0,
                   min_manifold_length: float = 5.0,
                   max_manifold_length: float = 11.0,
                   n_threads: int = 0, halo_data=None):
    """Raw [N, 7] forward-backward residual vectors (no refinement).

    The hook for external solvers (scipy TRF/SLSQP in
    ``scripts/second_solver_crosscheck.py``) that need the residual — not
    its norm — at arbitrary points.  ``halo_data`` may carry precomputed
    ``(seeds[N,6], periods[N], vstables[N,6])`` so per-Jacobian batches of
    perturbations of ONE sample skip re-interpolating the halo family."""
    lib = _load()
    assert lib is not None, _build_error
    g = np.ascontiguousarray(guesses, np.float64)
    sp = np.ascontiguousarray(spiral_end, np.float64)
    n = g.shape[0]
    assert g.shape == (n, 66) and sp.shape == (7,)
    if halo_data is None:
        seeds, periods, vstables = _halo_arrays(halo_energies)
    else:
        seeds, periods, vstables = (
            np.ascontiguousarray(a, np.float64) for a in halo_data)
    assert seeds.shape == (n, 6) and periods.shape == (n,)
    r = np.empty((n, 7), np.float64)
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    lib.cr3bp_residual_batch(
        _dptr(g), n, int(n_segments), float(thrust), _dptr(sp),
        _dptr(seeds), _dptr(periods), _dptr(vstables),
        float(min_manifold_length), float(max_manifold_length),
        _dptr(r), n_threads)
    return r


def refine_batch(guesses, halo_energies, spiral_end,
                 n_segments: int = 20, thrust: float = 1.0,
                 max_iters: int = 30, tol: float = 1e-3,
                 max_shoot: float = 40.0, max_coast: float = 15.0,
                 min_shoot: float = 0.0,
                 min_manifold_length: float = 5.0,
                 max_manifold_length: float = 11.0,
                 min_mass: float = 408.0, max_mass: float = 470.0,
                 solver_mode: str = "optimal",
                 n_threads: int = 0):
    """LM-solve every warm start against the manifold boundary condition.

    ``min_mass``/``max_mass`` bound the NLP's terminal-mass variable.
    They default to the reference's ``min/max_mass_to_sample`` window
    (408-470 kg) — also the training-data normalisation window, so
    solved masses stay inside the diffusion model's unit hypercube.

    Returns a dict: refined[N,66], cost[N], pos_err[N], vel_err[N],
    final_mass[N] (the solved mass variable), terminal_mass[N] (full
    forward-propagated), iters[N], stationarity[N] (first-order
    achievable mass rate, diagnostic), opt_gain[N] (final ratchet step,
    kg — collapse below the tolerance certifies inform 1)."""
    lib = _load()
    assert lib is not None, _build_error
    g = np.ascontiguousarray(guesses, np.float64)
    sp = np.ascontiguousarray(spiral_end, np.float64)
    n = g.shape[0]
    assert g.shape == (n, 66) and sp.shape == (7,)
    seeds, periods, vstables = _halo_arrays(halo_energies)
    assert seeds.shape == (n, 6) and periods.shape == (n,)
    refined = np.empty_like(g)
    cost = np.empty(n, np.float64)
    pos = np.empty(n, np.float64)
    vel = np.empty(n, np.float64)
    mass = np.empty(n, np.float64)
    tmass = np.empty(n, np.float64)
    iters = np.empty(n, np.int32)
    stat = np.empty(n, np.float64)
    opt_gain = np.empty(n, np.float64)
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    optimal = 0 if str(solver_mode) == "feasible" else 1
    lib.cr3bp_refine_batch(
        _dptr(g), n, int(n_segments), float(thrust), _dptr(sp),
        _dptr(seeds), _dptr(periods), _dptr(vstables),
        float(min_manifold_length), float(max_manifold_length),
        int(max_iters), float(tol), float(max_shoot), float(max_coast),
        float(min_shoot), float(min_mass), float(max_mass), optimal,
        _dptr(refined), _dptr(cost), _dptr(pos),
        _dptr(vel), _dptr(mass), _dptr(tmass),
        iters.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), _dptr(stat),
        _dptr(opt_gain), n_threads)
    return {"refined": refined, "cost": cost, "pos_err": pos,
            "vel_err": vel, "final_mass": mass, "terminal_mass": tmass,
            "iters": iters, "stationarity": stat, "opt_gain": opt_gain}
