"""Abstract forward SDE interface (reference ``sde_lib.py:7-111``).

Unlike the reference, which builds a reverse-SDE *class* dynamically inside
``SDE.reverse`` (``sde_lib.py:84-111``), the TPU-native design keeps the SDE
a plain (hashable, static) Python object whose scalar hyper-parameters are
baked into jitted programs, and exposes the reverse dynamics as pure
functions of ``(x, t, score)``.  Samplers close over an SDE instance and a
score function; everything traces to a single XLA program.
"""
from __future__ import annotations

import abc

import jax.numpy as jnp


def _bcast(v, x):
    v = jnp.asarray(v)
    return v.reshape(v.shape + (1,) * (x.ndim - v.ndim))


class SDE(abc.ABC):
    """Forward SDE ``dx = f(x, t) dt + g(t) dW`` on t in [0, T]."""

    def __init__(self, N: int):
        self.N = int(N)

    @property
    @abc.abstractmethod
    def T(self) -> float:
        """End time of the SDE."""

    @abc.abstractmethod
    def sde(self, x, t):
        """Return (drift, diffusion); drift like x, diffusion shaped [B]."""

    @abc.abstractmethod
    def marginal_prob(self, x, t):
        """Mean/std of the marginal p_t(x | x_0): (mean like x, std [B])."""

    @abc.abstractmethod
    def prior_sampling(self, key, shape):
        """One sample from the prior p_T."""

    @abc.abstractmethod
    def prior_logp(self, z):
        """Log-density of the prior at z."""

    def discretize(self, x, t):
        """Euler-Maruyama discretization ``x_{i+1} = x_i + f_i + G_i z``
        (reference ``sde_lib.py:52-69``)."""
        dt = 1.0 / self.N
        drift, diffusion = self.sde(x, t)
        return drift * dt, diffusion * jnp.sqrt(dt)

    # ---- reverse-time dynamics as pure functions -------------------------
    def reverse_sde(self, x, t, score, probability_flow: bool = False):
        """Drift/diffusion of the reverse-time SDE/ODE given a precomputed
        score (reference ``sde_lib.py:93-101``)."""
        drift, diffusion = self.sde(x, t)
        scale = 0.5 if probability_flow else 1.0
        drift = drift - _bcast(diffusion, x) ** 2 * score * scale
        diffusion = jnp.zeros_like(diffusion) if probability_flow else diffusion
        return drift, diffusion

    def reverse_discretize(self, x, t, score, probability_flow: bool = False):
        """Discretized reverse iteration rule (reference ``sde_lib.py:103-108``)."""
        f, G = self.discretize(x, t)
        scale = 0.5 if probability_flow else 1.0
        rev_f = f - _bcast(G, x) ** 2 * score * scale
        rev_G = jnp.zeros_like(G) if probability_flow else G
        return rev_f, rev_G
