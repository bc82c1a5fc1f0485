"""Unit-hypercube [0, 1]^D helpers: periodic reflection and the reflected
heat-kernel score.

TPU-native rebuild of the reference math core
(``Reflected-Diffusion/cube.py:17-193``).  Semantics match the reference
exactly; the implementation is pure ``jnp`` and jit/vmap/scan friendly:

* Everything is functional and shape-static.
* The eigenfunction / image-reflection branch split of ``score_hk``
  (reference ``cube.py:176-191`` uses data-dependent boolean gather/scatter)
  is instead computed **densely on both branches** and merged with
  ``jnp.where`` on the per-sample time mask.  With D = 81 the wasted FLOPs
  are negligible and the result is one fused XLA kernel with no dynamic
  shapes (SURVEY.md section 2.1 "TPU note").
* Series accumulation is forced to float32 even under bf16 inputs: the
  denominators carry ``+ 1e-12`` guards (reference ``cube.py:107,146``) and
  lose all signal in bf16.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["reflect", "inside", "sample_hk", "score_hk"]

_PI = math.pi


def _bcast(v, x):
    """Reshape a per-sample vector ``v`` of shape [B] so it broadcasts
    against ``x`` of shape [B, ...] (reference ``cube.py:unsqueeze_as``)."""
    return v.reshape(v.shape + (1,) * (x.ndim - v.ndim))


def reflect(x):
    """Fold ``x`` into [0, 1] by repeated boundary reflection.

    Identical algebra to reference ``cube.py:34-49``: take ``x mod 2`` then
    mirror the (1, 2] half back down as ``2 - x``.
    """
    xm2 = jnp.mod(x, 2.0)
    return jnp.where(xm2 > 1.0, 2.0 - xm2, xm2)


def inside(x):
    """Per-sample membership test of the unit hypercube.

    Reference ``cube.py:17-31``.  Returns a bool vector of shape [B].
    """
    flat = x.reshape(x.shape[0], -1)
    return jnp.all((flat >= 0.0) & (flat <= 1.0), axis=-1)


def sample_hk(key, x, sigma):
    """Sample from the reflected heat kernel centred at ``x`` with std
    ``sigma`` (reference ``cube.py:52-70``): Gaussian perturbation followed
    by reflection into the cube.

    Args:
      key: PRNG key.
      x: [B, ...] starting points.
      sigma: scalar or [B] std of the underlying Gaussian.
    """
    import jax

    sigma = jnp.asarray(sigma)
    if sigma.ndim == 0:
        sigma = jnp.full((x.shape[0],), sigma, dtype=x.dtype)
    z = jax.random.normal(key, x.shape, dtype=x.dtype)
    return reflect(x + _bcast(sigma, x) * z)


def _score_hk_ef(x, x_orig, t, efs: int = 20):
    """Heat-kernel score via the cosine eigenfunction series (reference
    ``cube.py:73-107``), accurate for large diffusion time ``t``.

    p(x, t | x0) = 1 + 2 sum_k exp(-t k^2 pi^2) cos(pi k x) cos(pi k x0)
    score        = d/dx log p
                 = -2 pi sum_k k e_k sin(pi k x) cos(pi k x0) / (p + 1e-12)

    Shapes: x, x_orig [B, ...]; t [B].  Series accumulates in f32.
    """
    dtype = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(dtype)
    x0f = x_orig.astype(dtype)
    tf = t.astype(dtype)

    k = jnp.arange(1, efs + 1, dtype=dtype)  # [K]
    # [K, B, ...] broadcast layout, K leading like the reference's dim 0.
    kx = _PI * xf[None] * _bcast(k, xf[None])
    kx0 = _PI * x0f[None] * _bcast(k, x0f[None])

    # exp(-t k^2 pi^2): [K, B] -> broadcast to [K, B, ...]
    e = jnp.exp(-tf[None, :] * (k[:, None] ** 2) * (_PI**2))
    e_b = _bcast(e, kx)

    num = -2.0 * _PI * jnp.sum(e_b * _bcast(k, kx) * jnp.sin(kx) * jnp.cos(kx0), axis=0)
    denom = 1.0 + 2.0 * jnp.sum(e_b * jnp.cos(kx) * jnp.cos(kx0), axis=0)
    return (num / (denom + 1e-12)).astype(x.dtype)


def _score_hk_refl(x, x_orig, t, refls: int = 10):
    """Heat-kernel score via the method of images (reference
    ``cube.py:110-146``), accurate for small diffusion time ``t``.

    Images of x under the reflection group of [0, 1] are {2n + x, 2n - x};
    the density is a sum of Gaussians N(x0, 2t) at the images and the score
    follows by differentiating the log-sum.
    """
    dtype = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(dtype)
    x0f = x_orig.astype(dtype)
    tf = t.astype(dtype)

    shifts = jnp.arange(-2 * refls, 2 * refls + 1, 2, dtype=dtype)  # [R]
    r_b = _bcast(shifts, xf[None])  # [R, 1, ...] broadcasting helper
    # Images: [2R+1 copies of +x, then 2R+1 copies of -x] -> [2(2R+1), B, ...]
    x_imgs = jnp.concatenate([r_b + xf[None], r_b - xf[None]], axis=0)
    sign = jnp.concatenate([jnp.ones_like(shifts), -jnp.ones_like(shifts)], axis=0)

    dx = x_imgs - x0f[None]
    four_t = _bcast(4.0 * tf, dx[0])[None]  # [1, B, ...]
    coeff = -2.0 * dx / four_t
    e = jnp.exp(-(dx**2) / four_t)

    num = jnp.sum(coeff * e * _bcast(sign, e), axis=0)
    denom = jnp.sum(e, axis=0)
    return (num / (denom + 1e-12)).astype(x.dtype)


def score_hk(x, x_orig, sigma, efs: int = 20, refls: int = 10, min_cutoff: float = 1e-2):
    """Score of the reflected heat kernel on [0, 1]^D.

    Reference ``cube.py:149-193``.  The diffusion time is ``t = sigma^2/2``;
    samples with ``t > min_cutoff`` use the eigenfunction series, the rest
    use the image sum.  Where the reference splits the batch with boolean
    masks (dynamic shapes), we evaluate both series densely and select with
    ``jnp.where`` — static shapes, one fused kernel, bitwise-equal results.

    Args:
      x: [B, ...] sampled (perturbed) points.
      x_orig: [B, ...] heat-kernel origins (the clean data).
      sigma: scalar or [B] std of the underlying Gaussian.
    """
    sigma = jnp.asarray(sigma)
    if sigma.ndim == 0:
        sigma = jnp.full((x.shape[0],), sigma, dtype=x.dtype)
    t = (sigma.astype(jnp.float32) ** 2) / 2.0

    s_ef = _score_hk_ef(x, x_orig, t, efs=efs)
    s_refl = _score_hk_refl(x, x_orig, t, refls=refls)
    use_ef = _bcast(t > min_cutoff, x)
    return jnp.where(use_ef, s_ef, s_refl)
