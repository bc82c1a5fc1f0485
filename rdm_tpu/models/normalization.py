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
