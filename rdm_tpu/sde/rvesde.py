"""Reflected Variance-Exploding SDE (reference ``sde_lib.py:114-161``).

sigma(t) = sigma_min * (sigma_max / sigma_min)^t, zero drift, uniform prior
on the unit cube, prior_logp = 0 (the cube has unit volume).  GTO config:
sigma_min 0.01, sigma_max 5, N = 1000 (``configs/train.yaml:25-29``).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .base import SDE, _bcast


class RVESDE(SDE):
    def __init__(self, sigma_min: float = 0.01, sigma_max: float = 50.0,
                 N: int = 1000, T: float = 1.0):
        super().__init__(N)
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)
        self._T = float(T)

    # Hashability: scalar-parameterised SDEs are static under jit.
    def __hash__(self):
        return hash((type(self).__name__, self.sigma_min, self.sigma_max, self.N, self._T))

    def __eq__(self, other):
        return (type(self) is type(other)
                and (self.sigma_min, self.sigma_max, self.N, self._T)
                == (other.sigma_min, other.sigma_max, other.N, other._T))

    @property
    def T(self) -> float:
        return self._T

    def sigma(self, t):
        return self.sigma_min * (self.sigma_max / self.sigma_min) ** t

    @property
    def discrete_sigmas(self):
        """Geometric sigma ladder for the SMLD discretization
        (reference ``sde_lib.py:126-127``)."""
        return jnp.exp(jnp.linspace(math.log(self.sigma_min),
                                    math.log(self.sigma_max), self.N))

    def sde(self, x, t):
        sigma = self.sigma(t)
        drift = jnp.zeros_like(x)
        diffusion = sigma * math.sqrt(2.0 * (math.log(self.sigma_max) - math.log(self.sigma_min)))
        return drift, jnp.broadcast_to(jnp.asarray(diffusion), jnp.shape(t))

    def marginal_prob(self, x, t):
        std = self.sigma(t)
        return x, std

    def prior_sampling(self, key, shape):
        return jax.random.uniform(key, shape)

    def prior_logp(self, z):
        return jnp.zeros_like(z)

    def discretize(self, x, t):
        """SMLD (NCSN) discretization over the discrete sigma ladder
        (reference ``sde_lib.py:153-161``)."""
        timestep = (t * (self.N - 1) / self.T).astype(jnp.int32)
        sigmas = self.discrete_sigmas
        sigma = sigmas[timestep]
        adjacent = jnp.where(timestep == 0, jnp.zeros_like(sigma), sigmas[timestep - 1])
        f = jnp.zeros_like(x)
        G = jnp.sqrt(sigma**2 - adjacent**2)
        return f, G
