"""Predictor-Corrector sampler as a single ``lax.scan``.

Rebuild of reference ``sampling.py:133-339``.  The reference's Python loop
performs 1000 sequential CUDA-dispatched forwards (~30 ms/step on A100,
BASELINE.md); here the whole trajectory is ONE compiled XLA program: scan
over precomputed timesteps, with the EM predictor step, the reflection
fold, and the (optional) Langevin corrector fused per iteration.  CFG runs
inside the scanned score function as a single 2B-batch forward.

Reference bugs intentionally fixed (SURVEY.md section "Known reference
bugs"): the final denoiser output is actually USED (``sampling.py:335``
discards it) and the prior is drawn once (``:308,324`` draw twice).

Loop-structure parity: the reference iterates ``for i in range(N)`` but
only updates when ``i < N-1`` (``sampling.py:327-332``), so there are
exactly N-1 corrector+predictor updates — we scan over ``timesteps[:-1]``.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from rdm_tpu.ops import cube
from . import register_corrector, register_denoiser, register_predictor
from . import get_corrector, get_denoiser, get_predictor


def _bcast(v, x):
    v = jnp.asarray(v)
    return v.reshape(v.shape + (1,) * (x.ndim - v.ndim))


# --------------------------------------------------------------------------
# Predictors  (factory(sde, score_fn, **kw) -> update(x, t, key) -> (x, x_mean))

@register_predictor(name="euler_maruyama")
def reflected_euler_maruyama(sde, score_fn):
    """Reference ``sampling.py:193-207``."""
    dt = -1.0 / sde.N

    def update(x, t, key):
        z = jax.random.normal(key, x.shape, x.dtype)
        score = score_fn(x, t)
        drift, diffusion = sde.reverse_sde(x, t, score)
        x_mean = x + drift * dt
        x_new = x_mean + _bcast(diffusion, x) * math.sqrt(-dt) * z
        return cube.reflect(x_new), cube.reflect(x_mean)

    return update


@register_predictor(name="none")
def none_predictor(sde, score_fn):
    def update(x, t, key):
        return x, x
    return update


# --------------------------------------------------------------------------
# Correctors (factory(sde, score_fn, snr, n_steps) -> update(x, t, key))

@register_corrector(name="langevin")
def reflected_langevin(sde, score_fn, snr, n_steps):
    """Reference ``sampling.py:210-233``: SNR-scaled Langevin with batch-mean
    gradient/noise norms and reflection after every substep."""

    def update(x, t, key):
        def body(i, carry):
            x, x_mean, key = carry
            key, kn = jax.random.split(key)
            grad = score_fn(x, t)
            noise = jax.random.normal(kn, x.shape, x.dtype)
            grad_norm = jnp.mean(jnp.linalg.norm(grad.reshape(grad.shape[0], -1), axis=-1))
            noise_norm = jnp.mean(jnp.linalg.norm(noise.reshape(noise.shape[0], -1), axis=-1))
            step_size = (snr * noise_norm / grad_norm) ** 2 * 2.0 * jnp.ones_like(t)
            # Divergence from reference: if the score is identically ~0 (the
            # heat-kernel score underflows at sigma_max in f32), the
            # SNR-matched step size blows up to inf and poisons the chain
            # with NaNs; an SNR-matched step is meaningless without gradient
            # signal, so skip the update instead.
            step_size = jnp.where(grad_norm > 1e-10, step_size, 0.0)
            x_mean = x + _bcast(step_size, x) * grad
            x = x_mean + _bcast(jnp.sqrt(step_size * 2.0), x) * noise
            return cube.reflect(x), cube.reflect(x_mean), key

        x, x_mean, _ = jax.lax.fori_loop(0, n_steps, body, (x, x, key))
        return x, x_mean

    return update


@register_corrector(name="none")
def none_corrector(sde, score_fn, snr, n_steps):
    def update(x, t, key):
        return x, x
    return update


# --------------------------------------------------------------------------
# Denoisers (factory(denoiser_fn) -> update(x, x_mean, t))

@register_denoiser(name="network")
def trained_denoiser(denoiser_fn):
    """``(x - denoiser(x, t)).clamp(0, 1)`` (reference ``sampling.py:244-248``)."""
    def update(x, x_mean, t):
        return jnp.clip(x - denoiser_fn(x, t), 0.0, 1.0)
    return update


@register_denoiser(name="mean")
def mean_denoiser(denoiser_fn):
    def update(x, x_mean, t):
        return x_mean
    return update


@register_denoiser(name="none")
def none_denoiser(denoiser_fn):
    def update(x, x_mean, t):
        return x
    return update


# --------------------------------------------------------------------------

def get_pc_sampler(sde, shape, predictor="euler_maruyama", corrector="none",
                   denoiser="none", snr=0.01, n_steps=1, eps=1e-3):
    """Create the scan-compiled PC sampler.

    Returns ``pc_sampler(score_fn, key, denoiser_fn=None) -> (x, nfe)``
    where ``score_fn(x, t)`` is a plain or CFG-wrapped score closure (see
    ``rdm_tpu.models.registry``).  Jit this (or call it inside jit): the
    entire N-step loop lowers to one XLA while loop.
    """
    predictor_factory = get_predictor(predictor)
    corrector_factory = get_corrector(corrector)
    denoiser_factory = get_denoiser(denoiser)
    B = shape[0]

    def pc_sampler(score_fn, key, denoiser_fn=None, z=None):
        pred_update = predictor_factory(sde, score_fn)
        corr_update = corrector_factory(sde, score_fn, snr, n_steps)
        deno_update = denoiser_factory(denoiser_fn)

        k_init, k_scan = jax.random.split(key)
        x = sde.prior_sampling(k_init, shape) if z is None else z
        timesteps = jnp.linspace(sde.T, eps, sde.N)

        def body(carry, t):
            x, x_mean, key = carry
            key, kc, kp = jax.random.split(key, 3)
            vec_t = jnp.full((B,), t, x.dtype)
            x, _ = corr_update(x, vec_t, kc)
            x, x_mean = pred_update(x, vec_t, kp)
            return (x, x_mean, key), None

        (x, x_mean, _), _ = jax.lax.scan(body, (x, x, k_scan), timesteps[:-1])

        vec_eps = jnp.full((B,), eps, x.dtype)
        x = deno_update(x, x_mean, vec_eps)
        return x, sde.N * (n_steps + 1)

    return pc_sampler
