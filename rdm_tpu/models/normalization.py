"""Normalization zoo (reference ``models/normalization.py``): the
``get_normalization(config, conditional)`` registry with the NCSNv1-era
variants.  The live NCSN++ uses plain GroupNorm (reference uses
``nn.GroupNorm`` directly), but the registry is part of the API surface
for the older model families.

Flax/NHWC ports.  Conditional variants embed integer class labels into
per-channel gains/biases exactly like the reference's nn.Embedding
formulations (gamma init N(1, 0.02), beta zero).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def get_normalization(config, conditional: bool = False):
    """Reference ``normalization.py:7-31``."""
    norm = config.model.normalization
    if conditional:
        if norm == "InstanceNorm++":
            return lambda **kw: ConditionalInstanceNorm2dPlus(
                num_classes=config.model.num_classes, **kw)
        raise NotImplementedError(f"{norm} not implemented yet.")
    if norm == "InstanceNorm":
        return lambda **kw: InstanceNorm2d(**kw)
    if norm == "InstanceNorm++":
        return lambda **kw: InstanceNorm2dPlus(**kw)
    if norm == "VarianceNorm":
        return lambda **kw: VarianceNorm2d(**kw)
    if norm == "GroupNorm":
        return lambda num_features=None, num_groups=32, **kw: nn.GroupNorm(
            num_groups=num_groups)
    raise ValueError("Unknown normalization: %s" % norm)


class InstanceNorm2d(nn.Module):
    """Per-sample, per-channel normalization over H, W."""
    affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + self.eps)
        if self.affine:
            C = x.shape[-1]
            g = self.param("scale", nn.initializers.ones, (C,))
            b = self.param("bias", nn.initializers.zeros, (C,))
            h = h * g + b
        return h


class VarianceNorm2d(nn.Module):
    """Scale-only normalization (reference ``normalization.py:126-142``)."""
    bias: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = x / jnp.sqrt(var + self.eps)
        C = x.shape[-1]
        alpha = self.param("alpha", nn.initializers.normal(0.02), (C,)) + 1.0
        out = h * alpha
        if self.bias:
            out = out + self.param("beta", nn.initializers.zeros, (C,))
        return out


class InstanceNorm2dPlus(nn.Module):
    """InstanceNorm++ (reference ``normalization.py:145-172``): instance
    norm plus a term re-injecting the per-channel mean statistics, which
    fixes instance norm's color-shift artifacts."""
    bias: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        means = jnp.mean(x, axis=(1, 2))                       # (N, C)
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True)
        means_norm = (means - m) / jnp.sqrt(v + self.eps)      # (N, C)

        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + self.eps)

        gamma = self.param("gamma", nn.initializers.normal(0.02), (C,)) + 1.0
        alpha = self.param("alpha", nn.initializers.normal(0.02), (C,)) + 1.0
        out = gamma * h + means_norm[:, None, None, :] * alpha
        if self.bias:
            out = out + self.param("beta", nn.initializers.zeros, (C,))
        return out


def _cond_embed(module, num_classes: int, C: int, bias: bool):
    """Reference conditional-norm embedding table: scale part initialised
    ``uniform_()`` in [0, 1) (the reference COMMENT says N(1, 0.02) but the
    CODE is uniform — ``normalization.py:36-40,62-66,117-121``; behaviour
    parity keeps the code), bias part zeros."""
    n_emb = 2 if bias else 1
    table = module.param(
        "embed",
        lambda key, shape: jnp.concatenate(
            [jax.random.uniform(key, (shape[0], C)),
             jnp.zeros((shape[0], C))], axis=-1) if bias else
        jax.random.uniform(key, shape),
        (num_classes, n_emb * C))
    return table


def _apply_cond_affine(h, table, y, C: int, bias: bool):
    emb = table[y.astype(jnp.int32)]
    gamma = emb[:, :C]
    out = gamma[:, None, None, :] * h
    if bias:
        out = out + emb[:, C:][:, None, None, :]
    return out


class ConditionalBatchNorm2d(nn.Module):
    """Reference ``normalization.py:28-51``: affine-free batch norm with a
    per-class (gamma, beta) embedding."""
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y, *, train: bool = True):
        h = nn.BatchNorm(use_running_average=not train, use_bias=False,
                         use_scale=False)(x)
        C = x.shape[-1]
        return _apply_cond_affine(h, _cond_embed(self, self.num_classes, C,
                                                 self.bias), y, C, self.bias)


class ConditionalInstanceNorm2d(nn.Module):
    """Reference ``normalization.py:53-76``: affine-free instance norm with
    a per-class (gamma, beta) embedding."""
    num_classes: int
    bias: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, y):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + self.eps)
        C = x.shape[-1]
        return _apply_cond_affine(h, _cond_embed(self, self.num_classes, C,
                                                 self.bias), y, C, self.bias)


class ConditionalVarianceNorm2d(nn.Module):
    """Reference ``normalization.py:78-93``: scale-only normalization with a
    per-class gamma embedding (init N(1, 0.02) — here the comment and code
    agree)."""
    num_classes: int
    bias: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, y):
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = x / jnp.sqrt(var + self.eps)
        C = x.shape[-1]
        table = self.param(
            "embed",
            lambda key, shape: jax.random.normal(key, shape) * 0.02 + 1.0,
            (self.num_classes, C))
        gamma = table[y.astype(jnp.int32)]
        return gamma[:, None, None, :] * h


class ConditionalNoneNorm2d(nn.Module):
    """Reference ``normalization.py:111-131``: no normalization, just the
    per-class (gamma, beta) affine."""
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        C = x.shape[-1]
        return _apply_cond_affine(x, _cond_embed(self, self.num_classes, C,
                                                 self.bias), y, C, self.bias)


class NoneNorm2d(nn.Module):
    """Reference ``normalization.py:134-139``: identity."""
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        return x


class ConditionalInstanceNorm2dPlus(nn.Module):
    """Class-conditional InstanceNorm++ (reference
    ``normalization.py:175-208``): per-class gamma/alpha/beta embeddings."""
    num_classes: int
    bias: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, y):
        C = x.shape[-1]
        means = jnp.mean(x, axis=(1, 2))
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True)
        means_norm = (means - m) / jnp.sqrt(v + self.eps)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = (x - mean) / jnp.sqrt(var + self.eps)

        n_emb = 3 if self.bias else 2
        table = self.param(
            "embed",
            lambda key, shape: jnp.concatenate(
                [jax.random.normal(key, (shape[0], 2 * C)) * 0.02 + 1.0,
                 jnp.zeros((shape[0], C))] if self.bias else
                [jax.random.normal(key, (shape[0], 2 * C)) * 0.02 + 1.0],
                axis=-1),
            (self.num_classes, n_emb * C))
        emb = table[y.astype(jnp.int32)]
        gamma, alpha = emb[:, :C], emb[:, C:2 * C]
        out = gamma[:, None, None, :] * h + \
            means_norm[:, None, None, :] * alpha[:, None, None, :]
        if self.bias:
            out = out + emb[:, 2 * C:][:, None, None, :]
        return out
