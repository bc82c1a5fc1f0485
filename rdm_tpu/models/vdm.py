"""VDM score network, Flax/NHWC rebuild of reference ``models/vdm.py``:
a constant-channel (non-downsampling) U-Net with image Fourier features,
EDM-style convs, timestep embedding of ``1000 * (sigma - sigma_min) /
(sigma_max - sigma_min)``, and optional attention.  Registered ``'vdm'``.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layersv2 import EDMConv2d, EDMLinear, attention_op
from .registry import register_model


def image_fourier_features(x, start: int = 6, end: int = 8):
    """Reference ``vdm.py:13-28`` (NHWC: frequencies expand the channel
    axis; ordering matches torch repeat_interleave on channels)."""
    freqs = jnp.asarray([2.0 ** k for k in range(start, end)]) * 2 * math.pi
    nf = freqs.shape[0]
    B, H, W, C = x.shape
    xr = jnp.repeat(x, nf, axis=-1)  # channel-interleaved like torch dim=1
    f = jnp.tile(freqs, (C,))
    ang = xr * f[None, None, None, :]
    return jnp.concatenate([x, jnp.sin(ang), jnp.cos(ang)], axis=-1)


def get_timestep_embedding(t, embedding_dim: int):
    """Reference ``vdm.py:31-44`` (t scaled by 1000; sin before cos)."""
    t = t * 1000.0
    half = embedding_dim // 2
    emb = math.log(10000) / (half - 1)
    emb = jnp.exp(jnp.arange(half) * -emb)
    emb = t[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class VDMResNetBlock(nn.Module):
    """Reference ``vdm.py:47-80``."""
    out_ch: int
    cond_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond, *, train: bool = False):
        in_ch = x.shape[-1]
        h = jax.nn.silu(nn.GroupNorm(num_groups=min(in_ch // 4, 32), epsilon=1e-6,
                                     dtype=self.dtype, name="norm1")(x))
        h = EDMConv2d(self.out_ch, 3, name="conv1", dtype=self.dtype)(h)
        h = h + EDMLinear(self.out_ch, use_bias=False, init_weight=0.0,
                          name="cond_map", dtype=self.dtype)(cond)[:, None, None, :]
        h = jax.nn.silu(nn.GroupNorm(num_groups=min(self.out_ch // 4, 32),
                                     epsilon=1e-6, dtype=self.dtype,
                                     name="norm2")(h))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = EDMConv2d(self.out_ch, 3, init_weight=0.0, name="conv2",
                      dtype=self.dtype)(h)
        if in_ch != self.out_ch:
            x = EDMConv2d(self.out_ch, 1, name="skip", dtype=self.dtype)(x)
        return h + x


class VDMAttnBlock(nn.Module):
    """Reference ``vdm.py:83-97`` (single head)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        y = nn.GroupNorm(num_groups=min(C // 4, 32), epsilon=1e-6,
                         dtype=self.dtype, name="norm")(x)
        qkv = EDMConv2d(3 * C, 1, name="qkv", dtype=self.dtype)(y)
        # torch reshape(B, C, 3, L): the 3C channels interleave as
        # (channel, qkv-triplet) — see the ADM attention note.
        qkv = qkv.reshape(B, H * W, C, 3).transpose(0, 2, 3, 1)  # (B, C, 3, L)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        w = attention_op(q, k)
        a = jnp.einsum("nqk,nck->ncq", w, v)  # (B, C, L)
        a = a.transpose(0, 2, 1).reshape(B, H, W, C)
        return EDMConv2d(C, 1, init_weight=0.0, name="proj_out",
                         dtype=self.dtype)(a) + x


@register_model(name="vdm")
class VDM(nn.Module):
    channels: int = 128
    num_blocks: int = 32
    attention: bool = False
    dropout: float = 0.1
    num_channels: int = 3  # data channels
    sigma_min: float = 0.01
    sigma_max: float = 50.0
    scale_by_sigma: bool = True
    image_fourier: bool = True
    image_fourier_start: int = 6
    image_fourier_end: int = 8
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_config(cls, config):
        m = config.model
        return cls(channels=m.channels, num_blocks=m.num_blocks,
                   attention=m.get("attention", False), dropout=m.dropout,
                   num_channels=config.data.num_channels,
                   sigma_min=config.sde.sigma_min, sigma_max=config.sde.sigma_max,
                   scale_by_sigma=m.get("scale_by_sigma", True),
                   image_fourier=m.get("image_fourier", True),
                   image_fourier_start=m.get("image_fourier_start", 6),
                   image_fourier_end=m.get("image_fourier_end", 8))

    @nn.compact
    def __call__(self, x, time_cond, class_labels=None, *, train: bool = False):
        ch = self.channels
        sigma = time_cond
        t = (sigma - self.sigma_min) / (self.sigma_max - self.sigma_min)
        temb = get_timestep_embedding(t, ch)
        cond = EDMLinear(4 * ch, name="cond_map0", dtype=self.dtype)(temb)
        cond = EDMLinear(4 * ch, name="cond_map1", dtype=self.dtype)(jax.nn.silu(cond))

        if self.image_fourier:
            x = image_fourier_features(x, self.image_fourier_start,
                                       self.image_fourier_end)
        x = EDMConv2d(ch, 3, name="conv_in", dtype=self.dtype)(x)

        outputs = [x]
        for i in range(self.num_blocks):
            x = VDMResNetBlock(ch, 4 * ch, self.dropout, name=f"enc{i}",
                               dtype=self.dtype)(x, cond, train=train)
            if self.attention:
                x = VDMAttnBlock(name=f"enc_attn{i}", dtype=self.dtype)(x)
            outputs.append(x)

        x = VDMResNetBlock(ch, 4 * ch, self.dropout, name="mid1",
                           dtype=self.dtype)(x, cond, train=train)
        x = VDMAttnBlock(name="midattn", dtype=self.dtype)(x)
        x = VDMResNetBlock(ch, 4 * ch, self.dropout, name="mid2",
                           dtype=self.dtype)(x, cond, train=train)

        for i in range(self.num_blocks + 1):
            x = jnp.concatenate([x, outputs.pop()], axis=-1)
            x = VDMResNetBlock(ch, 4 * ch, self.dropout, name=f"dec{i}",
                               dtype=self.dtype)(x, cond, train=train)
            if self.attention:
                x = VDMAttnBlock(name=f"dec_attn{i}", dtype=self.dtype)(x)
        if outputs:
            raise ValueError("Something went wrong with the blocks")

        x = jax.nn.silu(nn.GroupNorm(num_groups=min(ch // 4, 32), epsilon=1e-6,
                                     dtype=self.dtype, name="out_norm")(x))
        out = EDMConv2d(self.num_channels, 3, init_weight=0.0, name="out_conv",
                        dtype=self.dtype)(x)
        if self.scale_by_sigma:
            out = out / sigma[:, None, None, None]
        return out
