"""ADM (EDM variant) U-Net, Flax/NHWC rebuild of reference
``models/adm.py:12-194``.  Used by the ImageNet64C config
(``configs/model/adm.yaml``); registered as ``'adm'`` through a wrapper
that one-hot encodes integer labels, feeds ``log(sigma / 2)`` as the noise
label, runs the backbone in bf16 (the reference runs fp16 —
``adm.py:189``) and divides by sigma when ``scale_by_sigma``.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layersv2 import (EDMConv2d, EDMGroupNorm, EDMLinear, PositionalEmbedding,
                       attention_op)
from .registry import register_model

_INIT = dict(init_mode="kaiming_uniform", init_weight=(1 / 3) ** 0.5,
             init_bias=(1 / 3) ** 0.5)
_INIT_ZERO = dict(init_mode="kaiming_uniform", init_weight=0.0, init_bias=0.0)


class UNetBlock(nn.Module):
    """Reference ``adm.py:12-66``: GN -> silu -> conv (opt. resample) ->
    adaptive-scale FiLM -> GN -> silu -> dropout -> zero-conv -> skip,
    optional self-attention tail."""
    out_channels: int
    emb_channels: int
    up: bool = False
    down: bool = False
    attention: bool = False
    channels_per_head: int = 64
    dropout: float = 0.0
    skip_scale: float = 1.0
    eps: float = 1e-5
    adaptive_scale: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, *, train: bool = False):
        in_ch = x.shape[-1]
        out_ch = self.out_channels
        num_heads = out_ch // self.channels_per_head if self.attention else 0

        orig = x
        h = EDMConv2d(out_ch, 3, up=self.up, down=self.down, name="conv0",
                      dtype=self.dtype, **_INIT)(
            jax.nn.silu(EDMGroupNorm(eps=self.eps, name="norm0",
                                     dtype=self.dtype)(x)))
        params = EDMLinear(out_ch * (2 if self.adaptive_scale else 1),
                           name="affine", dtype=self.dtype, **_INIT)(emb)
        params = params[:, None, None, :].astype(h.dtype)
        if self.adaptive_scale:
            scale, shift = jnp.split(params, 2, axis=-1)
            h = jax.nn.silu(shift + EDMGroupNorm(eps=self.eps, name="norm1",
                                                 dtype=self.dtype)(h) * (scale + 1))
        else:
            h = jax.nn.silu(EDMGroupNorm(eps=self.eps, name="norm1",
                                         dtype=self.dtype)(h + params))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = EDMConv2d(out_ch, 3, name="conv1", dtype=self.dtype, **_INIT_ZERO)(h)

        if out_ch != in_ch or self.up or self.down:
            kernel = 1 if out_ch != in_ch else 0
            orig = EDMConv2d(out_ch, kernel, up=self.up, down=self.down,
                             name="skip", dtype=self.dtype, **_INIT)(orig)
        x = (h + orig) * self.skip_scale

        if num_heads:
            B, H, W, C = x.shape
            y = EDMGroupNorm(eps=self.eps, name="norm2", dtype=self.dtype)(x)
            qkv = EDMConv2d(C * 3, 1, name="qkv", dtype=self.dtype, **_INIT)(y)
            # torch: qkv.reshape(B*heads, C//heads, 3, L) interprets the 3C
            # channel axis as (head, channel_within_head, qkv-triplet) —
            # i.e. q/k/v are INTERLEAVED per channel, not blocked.
            qkv = qkv.reshape(B, H * W, num_heads, C // num_heads, 3)
            qkv = qkv.transpose(0, 2, 3, 4, 1).reshape(
                B * num_heads, C // num_heads, 3, H * W)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            w = attention_op(q, k)
            a = jnp.einsum("nqk,nck->ncq", w, v)
            a = a.reshape(B, num_heads, C // num_heads, H * W)
            a = a.transpose(0, 3, 1, 2).reshape(B, H, W, C)
            x = EDMConv2d(C, 1, name="proj", dtype=self.dtype, **_INIT_ZERO)(a) + x
            x = x * self.skip_scale
        return x


class ADM(nn.Module):
    """Reference ``adm.py:69-157``."""
    img_resolution: int = 64
    in_channels: int = 3
    out_channels: int = 3
    label_dim: int = 0
    augment_dim: int = 0
    model_channels: int = 192
    channel_mult: Sequence[int] = (1, 2, 3, 4)
    channel_mult_emb: int = 4
    num_blocks: int = 3
    attn_resolutions: Sequence[int] = (32, 16, 8)
    dropout: float = 0.10
    label_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, noise_labels, class_labels, augment_labels=None,
                 *, train: bool = False):
        emb_ch = self.model_channels * self.channel_mult_emb
        block_kw = dict(emb_channels=emb_ch, channels_per_head=64,
                        dropout=self.dropout, dtype=self.dtype)

        emb = PositionalEmbedding(self.model_channels, name="map_noise")(noise_labels)
        if self.augment_dim and augment_labels is not None:
            emb = emb + EDMLinear(self.model_channels, use_bias=False,
                                  name="map_augment", **_INIT_ZERO)(augment_labels)
        emb = jax.nn.silu(EDMLinear(emb_ch, name="map_layer0", **_INIT)(emb))
        emb = EDMLinear(emb_ch, name="map_layer1", **_INIT)(emb)
        if self.label_dim:
            tmp = class_labels
            if train and self.label_dropout:
                keep = (jax.random.uniform(self.make_rng("cond_drop"),
                                           (x.shape[0], 1)) >= self.label_dropout)
                tmp = tmp * keep.astype(tmp.dtype)
            emb = emb + EDMLinear(
                emb_ch, use_bias=False, init_mode="kaiming_normal",
                init_weight=self.label_dim ** 0.5, name="map_label")(tmp)
        emb = jax.nn.silu(emb)

        # encoder — skip list mirrors the reference's ModuleDict order
        skips = []
        cout = self.model_channels * self.channel_mult[0]
        for level, mult in enumerate(self.channel_mult):
            res = self.img_resolution >> level
            if level == 0:
                x = EDMConv2d(cout, 3, name=f"enc_{res}x{res}_conv",
                              dtype=self.dtype, **_INIT)(x)
            else:
                x = UNetBlock(x.shape[-1], down=True,
                              name=f"enc_{res}x{res}_down", **block_kw)(x, emb, train=train)
            skips.append(x)
            cout = self.model_channels * mult
            for idx in range(self.num_blocks):
                x = UNetBlock(cout, attention=(res in self.attn_resolutions),
                              name=f"enc_{res}x{res}_block{idx}", **block_kw)(
                    x, emb, train=train)
                skips.append(x)

        # decoder
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            res = self.img_resolution >> level
            if level == len(self.channel_mult) - 1:
                x = UNetBlock(x.shape[-1], attention=True,
                              name=f"dec_{res}x{res}_in0", **block_kw)(x, emb, train=train)
                x = UNetBlock(x.shape[-1], name=f"dec_{res}x{res}_in1",
                              **block_kw)(x, emb, train=train)
            else:
                x = UNetBlock(x.shape[-1], up=True, name=f"dec_{res}x{res}_up",
                              **block_kw)(x, emb, train=train)
            for idx in range(self.num_blocks + 1):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = UNetBlock(self.model_channels * mult,
                              attention=(res in self.attn_resolutions),
                              name=f"dec_{res}x{res}_block{idx}", **block_kw)(
                    x, emb, train=train)
        assert not skips
        x = EDMConv2d(self.out_channels, 3, name="out_conv", dtype=self.dtype,
                      **_INIT_ZERO)(
            jax.nn.silu(EDMGroupNorm(name="out_norm", dtype=self.dtype)(x)))
        return x


@register_model(name="adm")
class WrappedADM(nn.Module):
    """Reference ``adm.py:160-194``."""
    img_resolution: int = 64
    num_channels: int = 3
    num_classes: int = 1000
    model_channels: int = 192
    channel_mult: Sequence[int] = (1, 2, 3, 4)
    channel_mult_emb: int = 4
    num_blocks: int = 3
    attn_resolutions: Sequence[int] = (32, 16, 8)
    dropout: float = 0.1
    label_dropout: float = 0.0
    scale_by_sigma: bool = True
    dtype: jnp.dtype = jnp.bfloat16  # reference forwards in fp16

    @classmethod
    def from_config(cls, config):
        m = config.model
        return cls(
            img_resolution=config.data.image_size,
            num_channels=config.data.num_channels,
            num_classes=config.data.get("num_classes", 0),
            model_channels=m.model_channels,
            channel_mult=tuple(m.channel_mult),
            channel_mult_emb=m.channel_mult_emb, num_blocks=m.num_blocks,
            attn_resolutions=tuple(m.attn_resolutions), dropout=m.dropout,
            label_dropout=config.get("training", {}).get("drop_label", 0.0),
            scale_by_sigma=m.get("scale_by_sigma", True))

    @nn.compact
    def __call__(self, x, time_cond, class_labels=None, *, train: bool = False):
        sigma = time_cond
        B = x.shape[0]
        if class_labels is None:
            onehot = jnp.zeros((B, self.num_classes), x.dtype)
        elif class_labels.ndim == 1 or class_labels.shape[-1] == 1:
            idx = class_labels.reshape(B).astype(jnp.int32)
            onehot = jax.nn.one_hot(idx, self.num_classes, dtype=x.dtype)
        else:
            onehot = class_labels
        sigma_inp = jnp.log(sigma / 2.0)
        fx = ADM(img_resolution=self.img_resolution,
                 in_channels=self.num_channels, out_channels=self.num_channels,
                 label_dim=self.num_classes,
                 model_channels=self.model_channels,
                 channel_mult=self.channel_mult,
                 channel_mult_emb=self.channel_mult_emb,
                 num_blocks=self.num_blocks,
                 attn_resolutions=self.attn_resolutions, dropout=self.dropout,
                 label_dropout=self.label_dropout, dtype=self.dtype,
                 name="model")(x.astype(self.dtype), sigma_inp, onehot,
                               train=train)
        fx = fx.astype(jnp.float32)
        if self.scale_by_sigma:
            fx = fx / sigma[:, None, None, None]
        return fx
