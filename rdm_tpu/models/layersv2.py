"""EDM-style layers (Flax/NHWC) for ADM and VDM — rebuild of the reference
``models/layersv2.py`` (PositionalEmbedding, Conv2d with filter-resampling
up/down paths, Linear, GroupNorm, f32-softmax attention op).

Init semantics follow EDM: ``weight_init(mode, fan_in, fan_out) * gain``
with kaiming/xavier uniform/normal modes; ``init_weight=0`` zeroes the
residual-closing convs.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def edm_init(mode: str, gain: float = 1.0):
    """Returns a flax initializer matching reference ``weight_init``
    (``layersv2.py:22-27``) times ``gain``; fans are computed from the
    kernel shape like torch (HWIO for convs, (in, out) for dense)."""
    def init(key, shape, dtype=jnp.float32):
        if len(shape) == 4:  # HWIO conv kernel
            rf = shape[0] * shape[1]
            fan_in, fan_out = shape[2] * rf, shape[3] * rf
        elif len(shape) == 2:  # (in, out) dense kernel
            fan_in, fan_out = shape[0], shape[1]
        else:  # bias: fan supplied via gain-only scaling of kaiming bounds
            fan_in = fan_out = max(shape[0], 1)
        if mode == "xavier_uniform":
            w = math.sqrt(6 / (fan_in + fan_out)) * (
                jax.random.uniform(key, shape, dtype) * 2 - 1)
        elif mode == "xavier_normal":
            w = math.sqrt(2 / (fan_in + fan_out)) * jax.random.normal(key, shape, dtype)
        elif mode == "kaiming_uniform":
            w = math.sqrt(3 / fan_in) * (jax.random.uniform(key, shape, dtype) * 2 - 1)
        elif mode == "kaiming_normal":
            w = math.sqrt(1 / fan_in) * jax.random.normal(key, shape, dtype)
        else:
            raise ValueError(f'Invalid init mode "{mode}"')
        return w * gain
    return init


class PositionalEmbedding(nn.Module):
    """EDM positional embedding (``layersv2.py:7-20``): cos before sin."""
    num_channels: int
    max_positions: int = 10000
    endpoint: bool = False

    @nn.compact
    def __call__(self, x):
        half = self.num_channels // 2
        freqs = jnp.arange(half, dtype=jnp.float32)
        freqs = freqs / (half - (1 if self.endpoint else 0))
        freqs = (1 / self.max_positions) ** freqs
        ang = x[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=1)


class EDMLinear(nn.Module):
    out_features: int
    use_bias: bool = True
    init_mode: str = "kaiming_normal"
    init_weight: float = 1.0
    init_bias: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        w = self.param("weight", edm_init(self.init_mode, self.init_weight),
                       (in_f, self.out_features))
        y = x.astype(self.dtype) @ w.astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", edm_init(self.init_mode, self.init_bias),
                           (self.out_features,))
            y = y + b.astype(self.dtype)
        return y


def _depthwise_filter(resample_filter, channels):
    f = np.asarray(resample_filter, np.float32)
    f2 = np.outer(f, f) / (f.sum() ** 2)
    return jnp.asarray(np.tile(f2[:, :, None, None], (1, 1, 1, channels)))


class EDMConv2d(nn.Module):
    """Conv with optional filter-based 2x up/down resampling
    (``layersv2.py:30-72``, non-fused path).  NHWC."""
    out_channels: int
    kernel: int = 3
    use_bias: bool = True
    up: bool = False
    down: bool = False
    resample_filter: Sequence[int] = (1, 1)
    init_mode: str = "kaiming_normal"
    init_weight: float = 1.0
    init_bias: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        kf = len(self.resample_filter)
        f_pad = (kf - 1) // 2
        if self.up:
            # torch conv_transpose2d(f*4, stride=2, padding=f_pad) ==
            # input-dilated depthwise conv with padding kf-1-f_pad (the
            # filter is symmetric, so no kernel rotation needed)
            f = _depthwise_filter(self.resample_filter, C) * 4.0
            p = kf - 1 - f_pad
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype), f.astype(self.dtype),
                window_strides=(1, 1), padding=[(p, p), (p, p)],
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C)
        if self.down:
            f = _depthwise_filter(self.resample_filter, C)
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype), f.astype(self.dtype),
                window_strides=(2, 2), padding=[(f_pad, f_pad), (f_pad, f_pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C)
        if self.kernel:
            w = self.param("weight",
                           edm_init(self.init_mode, self.init_weight),
                           (self.kernel, self.kernel, C, self.out_channels))
            pad = self.kernel // 2
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w.astype(self.dtype), (1, 1),
                [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if self.use_bias:
                b = self.param("bias", edm_init(self.init_mode, self.init_bias),
                               (self.out_channels,))
                x = x + b.astype(self.dtype)
        return x


class EDMGroupNorm(nn.Module):
    """num_groups = min(32, C // 4), eps 1e-5 (``layersv2.py:92-103``)."""
    num_groups: int = 32
    min_channels_per_group: int = 4
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        groups = min(self.num_groups, C // self.min_channels_per_group)
        return nn.GroupNorm(num_groups=groups, epsilon=self.eps,
                            dtype=self.dtype, name="gn")(x)


def attention_op(q, k):
    """f32 softmax(q^T k / sqrt(C)) (``layersv2.py:105-111``); q, k are
    (N, C, L) like the reference's flattened heads."""
    w = jnp.einsum("ncq,nck->nqk", q.astype(jnp.float32),
                   (k / math.sqrt(k.shape[1])).astype(jnp.float32))
    return jax.nn.softmax(w, axis=2).astype(q.dtype)
