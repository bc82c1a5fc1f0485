"""Sampler tests.

The strongest check needs no trained network: if the score function is the
ANALYTIC reflected heat-kernel score toward a fixed point x*, the reverse
SDE from the uniform prior must concentrate samples at x* (the forward
process started from delta_{x*} has exactly that score).  This validates
the full scan-compiled PC loop — timestep schedule, EM update, reflection,
noise scaling — end to end.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdm_tpu.config import load_config
from rdm_tpu.ops import cube
from rdm_tpu.sde import RVESDE
from rdm_tpu.sampling import get_pc_sampler, get_ode_sampler, get_sampling_fn

SHAPE = (64, 1, 3)  # small D for fast CPU scans
X_STAR = 0.37


def analytic_score_fn(x, t, sde):
    _, std = sde.marginal_prob(jnp.zeros_like(x), t)
    return cube.score_hk(x, jnp.full_like(x, X_STAR), std)


@pytest.fixture(scope="module")
def sde():
    return RVESDE(sigma_min=0.01, sigma_max=5.0, N=300)


def test_pc_sampler_concentrates_on_target(sde):
    sampler = get_pc_sampler(sde, SHAPE, predictor="euler_maruyama",
                             corrector="none", eps=1e-5)
    score_fn = lambda x, t: analytic_score_fn(x, t, sde)
    x, nfe = jax.jit(lambda k: sampler(score_fn, k))(jax.random.PRNGKey(0))
    x = np.asarray(x)
    assert x.shape == SHAPE
    assert nfe == sde.N * 2
    assert (x >= 0).all() and (x <= 1).all()
    # samples concentrate near x* (final sigma ~ 0.01, EM discretisation adds spread)
    assert abs(x.mean() - X_STAR) < 0.05
    assert x.std() < 0.15


def test_pc_sampler_with_langevin_corrector(sde):
    sampler = get_pc_sampler(sde, SHAPE, predictor="euler_maruyama",
                             corrector="langevin", snr=0.01, n_steps=1, eps=1e-5)
    score_fn = lambda x, t: analytic_score_fn(x, t, sde)
    x, nfe = jax.jit(lambda k: sampler(score_fn, k))(jax.random.PRNGKey(1))
    x = np.asarray(x)
    assert nfe == sde.N * 2
    assert (x >= 0).all() and (x <= 1).all()
    assert abs(x.mean() - X_STAR) < 0.05


def test_pc_sampler_mean_denoiser(sde):
    sampler = get_pc_sampler(sde, SHAPE, corrector="none", denoiser="mean", eps=1e-5)
    score_fn = lambda x, t: analytic_score_fn(x, t, sde)
    x, _ = jax.jit(lambda k: sampler(score_fn, k))(jax.random.PRNGKey(2))
    x = np.asarray(x)
    # the noise-free mean is tighter around x*
    assert x.std() < 0.1


def test_pc_sampler_deterministic_under_key(sde):
    sampler = get_pc_sampler(sde, SHAPE, eps=1e-5)
    score_fn = lambda x, t: analytic_score_fn(x, t, sde)
    f = jax.jit(lambda k: sampler(score_fn, k)[0])
    a = f(jax.random.PRNGKey(3))
    b = f(jax.random.PRNGKey(3))
    c = f(jax.random.PRNGKey(4))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4


def test_ode_sampler_concentrates(sde):
    sampler = get_ode_sampler(sde, SHAPE, eps=1e-3, moll=200, side_eps=1e-2)
    score_fn = lambda x, t: analytic_score_fn(x, t, sde)
    x, nfe = jax.jit(lambda k: sampler(score_fn, k))(jax.random.PRNGKey(5))
    x = np.asarray(x)
    assert int(nfe) > 0
    assert np.isfinite(x).all()
    assert abs(x.mean() - X_STAR) < 0.08


def test_get_sampling_fn_dispatch(sde):
    cfg = load_config("train")
    fn = get_sampling_fn(cfg, sde, SHAPE, eps=1e-5)
    assert callable(fn)
    cfg.sampling.method = "ode"
    fn2 = get_sampling_fn(cfg, sde, SHAPE, eps=1e-3)
    assert callable(fn2)
    cfg.sampling.method = "nope"
    with pytest.raises(ValueError):
        get_sampling_fn(cfg, sde, SHAPE, eps=1e-3)


@pytest.mark.slow
def test_cfg_score_fn_combines(sde):
    """CFG combination rule (1+w) s_cond - w s_uncond with per-sample w."""
    from rdm_tpu.models.registry import get_cf_score_fn
    from rdm_tpu.models import NCSNpp

    model = NCSNpp(nf=16, ch_mult=(1, 2), num_res_blocks=1, dropout=0.0)
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 9, 9, 1))
    t = jnp.full((4,), 0.5)
    labels = jnp.ones((4, 1))
    params = model.init({"params": jax.random.PRNGKey(1)}, x, t, labels)["params"]
    # randomise the zero-init output conv so cond/uncond differ
    params["out_conv"]["conv"]["kernel"] = jax.random.normal(
        jax.random.PRNGKey(2), params["out_conv"]["conv"]["kernel"].shape) * 0.1

    from rdm_tpu.models.registry import get_score_fn
    plain = get_score_fn(sde, model, params)
    s_cond = plain(x, t, labels)
    s_uncond = plain(x, t, jnp.zeros_like(labels))

    for w in (0.0, 2.5):
        cf = get_cf_score_fn(sde, model, params, labels, w)
        expected = (1 + w) * s_cond - w * s_uncond
        np.testing.assert_allclose(np.asarray(cf(x, t)), np.asarray(expected),
                                   rtol=1e-5, atol=1e-6)

    # the static w=0 fast path (unconditional half elided at trace time)
    # must be BIT-identical to the general array-weight path at w=0
    fast = get_cf_score_fn(sde, model, params, labels, 0.0)(x, t)
    general = get_cf_score_fn(sde, model, params, labels, jnp.zeros((4,)))(x, t)
    assert jnp.array_equal(fast, general)
    # and its jaxpr must contain exactly ONE model-sized batch (no concat
    # doubling): the traced forward sees batch 4, not 8
    import jax as _jax
    jaxpr = _jax.make_jaxpr(
        get_cf_score_fn(sde, model, params, labels, 0.0))(x, t)
    assert "8,9,9" not in str(jaxpr.jaxpr.outvars[0].aval.shape)


def test_ode_denoiser_applied(sde):
    """round-1 weak item 6: ``denoiser_fn`` on the ODE sampler must not be
    a silent no-op — it runs the trained-denoiser stage (same contract as
    the PC sampler's "network" denoiser) on the final state."""
    sampler = get_ode_sampler(sde, SHAPE, eps=1e-3, moll=200, side_eps=1e-2)
    score_fn = lambda x, t: jnp.zeros_like(x)
    key = jax.random.PRNGKey(5)
    x_plain, nfe_plain = sampler(score_fn, key)
    shift = 0.125
    x_deno, nfe_deno = sampler(score_fn, key,
                               denoiser_fn=lambda x, t: jnp.full_like(x, shift))
    np.testing.assert_allclose(np.asarray(x_deno),
                               np.clip(np.asarray(x_plain) - shift, 0.0, 1.0),
                               rtol=1e-6, atol=1e-6)
    assert int(nfe_deno) == int(nfe_plain) + 1


def test_ode_mollifier_pinned():
    """Pin the ODE sampler's chosen boundary behavior (clip study,
    BENCH_NOTES "ODE/PC clip study"): default knobs moll=200 /
    side_eps=1e-2 (reference parity, ``sampling.py:362,371-375``), the
    mollifier vanishing smoothly at the cube faces, and moll=0 meaning
    no damping."""
    import inspect

    from rdm_tpu.sampling.ode import get_ode_sampler, make_bump

    sig = inspect.signature(get_ode_sampler)
    assert sig.parameters["moll"].default == 200
    assert sig.parameters["side_eps"].default == 1e-2

    bump = make_bump(200)
    x = jnp.array([0.0, 1e-4, 0.5, 1 - 1e-4, 1.0])
    b = np.asarray(bump(x))
    assert b[0] == 0.0 and b[4] == 0.0          # faces: drift killed
    assert b[1] < 1e-3 and b[3] < 1e-3          # smooth approach to 0
    assert 0.9 < b[2] <= 1.0                    # mid-cube: ~undamped
    # monotone damping toward each face
    xs = jnp.linspace(0.0, 0.5, 64)
    bs = np.asarray(bump(xs))
    assert (np.diff(bs) >= -1e-7).all()
    # moll=0 disables the mollifier entirely (identity passthrough)
    assert np.array_equal(np.asarray(make_bump(0)(x)), np.asarray(x))
