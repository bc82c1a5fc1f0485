"""RVESDE tests: closed-form checks + golden parity vs the reference."""
import jax
import jax.numpy as jnp
import numpy as np

from rdm_tpu.sde import RVESDE


def make_sde():
    return RVESDE(sigma_min=0.01, sigma_max=5.0, N=1000)


def test_marginal_prob_endpoints():
    sde = make_sde()
    x = jnp.ones((4, 2))
    _, std0 = sde.marginal_prob(x, jnp.zeros((4,)))
    _, std1 = sde.marginal_prob(x, jnp.ones((4,)))
    np.testing.assert_allclose(std0, 0.01, rtol=1e-6)
    np.testing.assert_allclose(std1, 5.0, rtol=1e-6)


def test_prior_is_uniform_cube():
    sde = make_sde()
    s = sde.prior_sampling(jax.random.PRNGKey(0), (1000, 3))
    assert float(s.min()) >= 0 and float(s.max()) <= 1
    np.testing.assert_allclose(float(s.mean()), 0.5, atol=0.05)
    np.testing.assert_allclose(np.asarray(sde.prior_logp(s)), 0.0)


def test_reverse_sde_zero_score_is_forward():
    sde = make_sde()
    x = jnp.ones((4, 2)) * 0.3
    t = jnp.full((4,), 0.7)
    drift_f, diff_f = sde.sde(x, t)
    drift_r, diff_r = sde.reverse_sde(x, t, jnp.zeros_like(x))
    np.testing.assert_allclose(drift_r, drift_f)
    np.testing.assert_allclose(diff_r, diff_f)


def test_probability_flow_halves_score_term():
    sde = make_sde()
    x = jnp.full((4, 2), 0.3)
    t = jnp.full((4,), 0.7)
    score = jnp.ones_like(x)
    d_sde, _ = sde.reverse_sde(x, t, score, probability_flow=False)
    d_ode, diff_ode = sde.reverse_sde(x, t, score, probability_flow=True)
    drift_f, _ = sde.sde(x, t)
    np.testing.assert_allclose(d_ode - drift_f, (d_sde - drift_f) / 2, rtol=1e-6)
    np.testing.assert_allclose(diff_ode, 0.0)


def test_golden_parity(golden_math):
    g = golden_math
    sde = make_sde()
    x = jnp.asarray(g["x_in"])
    t = jnp.asarray(g["sde_t"])
    _, diffusion = sde.sde(x, t)
    _, std = sde.marginal_prob(x, t)
    _, G = sde.discretize(x, t)
    np.testing.assert_allclose(np.asarray(diffusion), g["sde_diffusion"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(std), g["sde_std"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(G), g["sde_G"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sde.discrete_sigmas), g["discrete_sigmas"], rtol=1e-5)
