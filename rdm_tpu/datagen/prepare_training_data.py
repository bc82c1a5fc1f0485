"""Convert CR3BP solver outputs into the [N, 67] normalised training pickle
(reference ``GTO_Halo_DM/data_generation_scripts/prepare_training_data.py``).

Per result dict (the oracle/simulator output): filter ``final_mass > 408``,
normalise [classifier, times, 20x cartesian controls, fuel mass,
halo-period (by the halo orbit period at that energy), manifold length] to
[0, 1].  The halo period needs a Halo orbit solve per sample — pydylan
when available, otherwise an energy->period interpolation fit of the L1
halo family (Richardson linearisation around L1 gives the period scale;
see ``get_halo_period``).
"""
from __future__ import annotations

import functools
import os
import pickle
from typing import List

import numpy as np

MIN_SHOOT, MAX_SHOOT = 0.0, 40.0
MIN_COAST, MAX_COAST = 0.0, 15.0
MIN_HE, MAX_HE = 0.008, 0.095
MIN_MASS, MAX_MASS = 408.0, 470.0
MIN_MANIFOLD, MAX_MANIFOLD = 5.0, 11.0


def spherical_to_cart(r, alpha, beta):
    return np.array([r * np.cos(alpha) * np.cos(beta),
                     r * np.sin(alpha) * np.cos(beta),
                     r * np.sin(beta)])


def _halo_period_fallback(halo_energy: float) -> float:
    """L1 halo-family period approximation without pydylan.

    The in-plane linearised frequency at Earth-Moon L1 gives a period
    2 pi / omega_p ~ 2.69 TU at the libration point; the family's period
    grows weakly with orbit energy.  A linear fit in energy offset keeps
    the normalised halo period within a few percent over the benchmark's
    [0.008, 0.095] energy window — adequate for data NORMALISATION (the
    reference divides by the period, ``prepare_training_data.py:92``).
    """
    from rdm_tpu.physics import cr3bp as dyn

    mu = dyn.CR3BP_MU
    x = dyn.l1_position()
    r1, r2 = abs(x + mu), abs(1 - mu - x)
    c2 = (1 - mu) / r1**3 + mu / r2**3
    # in-plane frequency of the linearised CR3BP at a collinear point
    beta1 = 2 - c2 / 2
    omega_p = np.sqrt(-beta1 + np.sqrt(beta1**2 + (c2 - 1) * (1 + 2 * c2)))
    period0 = 2 * np.pi / omega_p
    return float(period0 * (1.0 + 0.6 * halo_energy))


@functools.lru_cache(maxsize=4096)
def get_halo_period(halo_energy: float) -> float:
    """Orbit period of the L1 halo at ``E_L1 + halo_energy``.

    Memoised: dataset preparation calls this once per ROW but there are
    only a handful of distinct energies (the reference's 11 alpha
    slices), and with pydylan installed each miss is a full
    differential-correction orbit solve.

    pydylan when installed (reference semantics,
    ``prepare_training_data.py:23-34``); otherwise the framework's own
    differentially-corrected halo family (``rdm_tpu.physics.halo``) — the
    SAME family data that parametrises the oracle's manifold boundary
    condition, so datagen normalisation and solver grading agree.  The
    linearised fit is kept only as a last resort (e.g. a broken family
    table cache)."""
    try:
        import pydylan
        earth, moon = pydylan.Body("Earth"), pydylan.Body("Moon")
        cr3bp = pydylan.eom.CR3BP(primary=earth, secondary=moon)
        l1 = cr3bp.find_equilibrium_point(pydylan.enum.LibrationPoint.L1)
        halo = pydylan.periodic_orbit.Halo(
            cr3bp, pydylan.enum.LibrationPoint.L1, l1[1] + halo_energy, 8000.)
        assert halo.solve_for_orbit() == pydylan.enum.OrbitGenerationResult.Success
        return halo.orbit_period
    except ImportError:
        try:
            from rdm_tpu.physics import halo as _halo
            return float(np.atleast_1d(
                _halo.interp_seed(float(halo_energy))["period"])[0])
        except Exception:
            return _halo_period_fallback(halo_energy)


def normalize_result(result: dict, num_segments: int = 20,
                     thrust: float = 1.0) -> np.ndarray | None:
    """One solver result dict -> normalised 67-vector, or None if filtered."""
    control = np.asarray(result["results.control"], float)
    if control[-3] <= MIN_MASS:
        return None
    classifier = float(result["cost_alpha"])
    out = [
        (classifier - MIN_HE) / (MAX_HE - MIN_HE),
        (control[0] - MIN_SHOOT) / (MAX_SHOOT - MIN_SHOOT),
        (control[1] - MIN_COAST) / (MAX_COAST - MIN_COAST),
        (control[2] - MIN_COAST) / (MAX_COAST - MIN_COAST),
    ]
    for i in range(num_segments):
        alpha, beta, r = control[3 + 3 * i: 3 + 3 * (i + 1)]
        cart = spherical_to_cart(r, alpha, beta)
        out.extend(((cart + thrust) / (2 * thrust)).tolist())
    out.append((control[-3] - MIN_MASS) / (MAX_MASS - MIN_MASS))
    out.append(control[-2] / get_halo_period(classifier))
    out.append((control[-1] - MIN_MANIFOLD) / (MAX_MANIFOLD - MIN_MANIFOLD))
    return np.asarray(out, np.float32)


def prepare_training_data(directory: str, output_dir: str | None = None,
                          num_segments: int = 20, thrust: float = 1.0,
                          save_every: int = 10_000, max_count: int = 150_000):
    """Scan a directory of per-solution result pickles and emit
    ``training_data_boundary_{n}.pkl`` files (reference main loop)."""
    output_dir = output_dir or directory
    control_list: List[np.ndarray] = []
    counter = 0
    for filename in sorted(os.listdir(directory)):
        if not filename.endswith(".pkl"):
            continue
        with open(os.path.join(directory, filename), "rb") as f:
            data = pickle.load(f)
        vec = normalize_result(data[0], num_segments, thrust)
        if vec is None:
            continue
        control_list.append(vec)
        counter += 1
        if counter % save_every == 0:
            _save(output_dir, control_list, counter)
        if counter >= max_count:
            break
    if control_list:
        _save(output_dir, control_list, counter)
    return counter


def _save(directory, control_list, counter):
    path = os.path.join(directory, f"training_data_boundary_{counter}.pkl")
    with open(path, "wb") as f:
        pickle.dump(np.asarray(control_list), f)
    print(f"All control vectors have been combined and saved to {path}")
