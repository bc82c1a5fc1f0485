"""Tests for the L1 halo family solver (rdm_tpu/physics/halo.py).

The reference delegates halo orbits to ``pydylan.periodic_orbit.Halo``
(``cr3bp_...warmstart.py:96-105``); these tests pin the from-scratch
replacement: Richardson seeding, differential correction, the family
table, and the stable-manifold branch data.
"""
import numpy as np
import pytest

from rdm_tpu.physics import halo
from rdm_tpu.physics.cr3bp import l1_position


@pytest.fixture(scope="module")
def table():
    return halo.family_table()


def test_table_covers_benchmark_window(table):
    # sample_data_diffusion_boundary.py:98-99: alpha in [0.008, 0.095]
    assert table["alphas"][0] <= 0.008
    assert table["alphas"][-1] >= 0.0949
    n = len(table["alphas"])
    assert table["states"].shape == (n, 6)
    assert table["periods"].shape == (n,)
    assert table["vstable"].shape == (n, 6)


def test_family_is_smooth_single_branch(table):
    # z0 strictly monotone = parametrised on the classical (pre-fold) branch
    assert np.all(np.diff(table["states"][:, 2]) > 0)
    ds = np.linalg.norm(np.diff(table["states"], axis=0), axis=1)
    assert ds.max() < 0.02
    dots = np.sum(table["vstable"][1:] * table["vstable"][:-1], axis=1)
    assert dots.min() > 0.99


def test_energy_matches_alpha_exactly(table):
    e_l1 = float(table["e_l1"])
    for i in [0, len(table["alphas"]) // 2, -1]:
        e = halo.energy_f64(table["states"][i])
        assert abs(e - e_l1 - table["alphas"][i]) < 1e-8


def test_perpendicular_crossing_states(table):
    # every member starts at y=0, vx=0, vz=0 (the corrector's invariant)
    S = table["states"]
    assert np.abs(S[:, 1]).max() < 1e-12
    assert np.abs(S[:, 3]).max() < 1e-6
    assert np.abs(S[:, 5]).max() < 1e-6


def test_interp_seed_shapes_and_clamping(table):
    out = halo.interp_seed([0.01, 0.05, 0.09])
    assert out["state0"].shape == (3, 6)
    assert out["period"].shape == (3,)
    assert out["vstable"].shape == (3, 6)
    np.testing.assert_allclose(np.linalg.norm(out["vstable"], axis=-1), 1.0,
                               atol=1e-12)
    # below-bifurcation and above-window queries clamp to the family ends
    lo = halo.interp_seed(0.0)
    np.testing.assert_allclose(lo["state0"], table["states"][0])
    hi = halo.interp_seed(0.2)
    np.testing.assert_allclose(hi["state0"], table["states"][-1])


def test_get_halo_period_exact_matches_table(table):
    i = 37
    a = float(table["alphas"][i])
    assert abs(halo.get_halo_period_exact(a) - table["periods"][i]) < 1e-12


def test_richardson_seed_is_perpendicular():
    s0, T = halo.richardson_seed(0.1)
    assert s0[1] == 0.0 and s0[3] == 0.0 and s0[5] == 0.0
    assert 2.0 < T < 3.5
    assert s0[0] < l1_position()  # seed sits Earth-side of L1
    s0s, _ = halo.richardson_seed(0.1, northern=False)
    np.testing.assert_allclose(s0s[2], -s0[2])


@pytest.mark.slow
def test_members_are_periodic(table):
    for i in [0, 55, len(table["alphas"]) - 1]:
        s0, T = table["states"][i], table["periods"][i]
        err = np.linalg.norm(halo.propagate_f64(s0, T) - s0)
        assert err < 1e-7, f"member {i} periodicity {err}"


@pytest.mark.slow
def test_stable_eigvec_contracts(table):
    i = 60
    M = halo.monodromy(table["states"][i], table["periods"][i])
    v = table["vstable"][i]
    Mv = M @ v
    lam = np.dot(Mv, v)
    # eigenvector of M with eigenvalue of magnitude < 1
    np.testing.assert_allclose(Mv, lam * v, atol=1e-6 * np.abs(lam))
    assert 0 < abs(lam) < 1
    # and the monodromy's dominant multiplier is its reciprocal
    assert abs(table["lam_u"][i] * lam - 1) < 1e-3


@pytest.mark.slow
def test_stable_branch_departs_toward_earth(table):
    i = 25
    s0, v = table["states"][i], table["vstable"][i]
    dep = halo.propagate_f64(s0 + halo.MANIFOLD_EPS * v, -2.0)
    ref = halo.propagate_f64(s0, -2.0)
    assert dep[0] < ref[0]  # StableLeft: interior / Earth-pointing branch


@pytest.mark.slow
def test_interp_matches_direct_solve_between_gridpoints(table):
    # solve an off-grid energy directly and compare with interpolation
    a = 0.5 * (table["alphas"][40] + table["alphas"][41])
    e_l1 = float(table["e_l1"])
    seed = table["states"][40].copy()
    s, T = halo.solve_halo(seed, e_l1 + a)
    out = halo.interp_seed(a)
    assert np.linalg.norm(out["state0"] - s) < 5e-5
    assert abs(out["period"] - T) < 5e-5
