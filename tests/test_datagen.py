"""Data-generation layer tests: init generator modes, normalisation
round trip, and the generate_data -> prepare_training_data path."""
import os
import pickle

import numpy as np
import pytest

from rdm_tpu.datagen import CR3BPInitGenerator, get_halo_period, prepare_training_data
from rdm_tpu.datagen.prepare_training_data import normalize_result, spherical_to_cart


def test_uniform_sample_layout():
    gen = CR3BPInitGenerator("uniform_sample", thrust=1.0,
                             min_mass_to_sample=408, max_mass_to_sample=470,
                             min_manifold_length=5, max_manifold_length=11)
    he, guesses = gen.get_earth_initial_guess(seed=3, number_of_segments=20,
                                              maximum_shooting_time=40,
                                              minimum_shooting_time=0)
    assert 0.008 <= he <= 0.095
    g = guesses[0]
    assert g.shape == (66,)
    assert 0 <= g[0] <= 40 and 0 <= g[1] <= 15 and 0 <= g[2] <= 15
    ctrl = g[3:63].reshape(20, 3)
    assert (ctrl[:, :2] >= 0).all() and (ctrl[:, :2] <= 2 * np.pi).all()
    assert (ctrl[:, 2] >= 0).all() and (ctrl[:, 2] <= 1).all()
    assert 408 <= g[63] <= 470 and 0 <= g[64] <= 1 and 5 <= g[65] <= 11
    # deterministic by seed
    he2, g2 = gen.get_earth_initial_guess(3, 20, 40, 0)
    np.testing.assert_array_equal(g2[0], g)


def test_halo_period_fallback_sane():
    # L1 linearised period ~2.7 TU; family periods in ~[2.5, 3.5]
    for he in (0.008, 0.05, 0.095):
        T = get_halo_period(he)
        assert 2.0 < T < 4.0


def test_normalize_result_roundtrip():
    rng = np.random.default_rng(0)
    control = np.zeros(69)
    control[0] = 22.0
    control[1], control[2] = 3.0, 7.5
    for i in range(20):
        control[3 + 3 * i] = rng.uniform(0, 2 * np.pi)   # alpha
        control[4 + 3 * i] = rng.uniform(0, 2 * np.pi)   # beta
        control[5 + 3 * i] = rng.uniform(0, 1)           # r
    control[-3] = 450.0
    control[-2] = 1.3
    control[-1] = 8.0
    result = {"results.control": control, "cost_alpha": 0.05}
    vec = normalize_result(result)
    assert vec.shape == (67,)
    np.testing.assert_allclose(vec[0], (0.05 - 0.008) / (0.095 - 0.008), rtol=1e-6)
    np.testing.assert_allclose(vec[1], 22 / 40, rtol=1e-6)
    # controls normalised from cartesian [-1,1] to [0,1]
    cart0 = spherical_to_cart(control[5], control[3], control[4])
    np.testing.assert_allclose(vec[4:7], (cart0 + 1) / 2, rtol=1e-5)
    np.testing.assert_allclose(vec[64], (450 - 408) / (470 - 408), rtol=1e-6)
    # mass filter
    low = dict(result)
    low["results.control"] = control.copy()
    low["results.control"][-3] = 407.0
    assert normalize_result(low) is None


def test_generate_then_prepare(tmp_path):
    import generate_data
    folder = str(tmp_path / "results")
    generate_data.main([
        "--seed", "0", "--seed_step", "4", "--result_folder", folder,
        "--save_infeasible"])
    files = [f for f in os.listdir(folder) if f.endswith(".pkl")]
    assert len(files) == 4  # one per seed (random guesses rarely feasible)
    # doctor the saved results to pass the mass filter so prepare keeps them
    for f in files:
        path = os.path.join(folder, f)
        with open(path, "rb") as fh:
            data = pickle.load(fh)
        c = np.asarray(data[0]["results.control"], float)
        c[-3] = 450.0
        data[0]["results.control"] = c
        with open(path, "wb") as fh:
            pickle.dump(data, fh)
    n = prepare_training_data(folder, output_dir=str(tmp_path))
    assert n == 4
    out = [f for f in os.listdir(tmp_path) if f.startswith("training_data_boundary_")]
    assert out
    with open(os.path.join(tmp_path, out[0]), "rb") as f:
        arr = pickle.load(f)
    assert arr.shape == (4, 67)
    assert np.isfinite(arr).all()
    # normalised to [0, 1] (halo period can exceed 1 slightly by design)
    assert arr[:, :65].min() >= -1e-6 and arr[:, :65].max() <= 1 + 1e-6
