"""Conditional 1-D U-Net (Flax / NLC layout).

Rebuild of the reference ``Unet1D`` — both the legacy original
(``GTO_Halo_DM/DM_scripts/classifier_free_guidance_cond_1d_improved_
constrained_diffusion.py:310-573``) and its RDM-registry port
(``Reflected-Diffusion/models/unet1d.py:170-332``) share this
architecture: conv1d stem (k7), per-level [ResBlock, ResBlock,
LinearAttention, Downsample], bottleneck ResBlock/Attention/ResBlock,
mirrored up path with odd-length nearest-resize fixups
(``Final_upsample_to_target_length``), residual stem concat, RMSNorm
pre-norms, GELU blocks with (scale+1, shift) time/class FiLM, and a
mask-value null label for classifier-free guidance.

Known reference bug NOT replicated: the RDM port's full ``Attention``
einsum ``'bhdk,bhdk->bhdl'`` (``models/unet1d.py:163``) is invalid and
raises at call time; we implement the legacy file's correct scaled
dot-product attention (``...diffusion.py:284-306``).

Layout note: tensors are (B, L, C) — TPU/XLA-native trailing-channel; the
torch reference is (B, C, L).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .registry import register_model


def _nearest_resize_1d(x, target_len):
    """torch nn.Upsample(mode='nearest') semantics on (B, L, C)."""
    L = x.shape[1]
    if L == target_len:
        return x
    idx = np.floor(np.arange(target_len) * L / target_len).astype(np.int32)
    return x[:, idx]


class RMSNorm1d(nn.Module):
    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        g = self.param("g", nn.initializers.ones, (C,))
        normed = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return normed * g * math.sqrt(C)


class SinusoidalPosEmb(nn.Module):
    dim: int
    theta: float = 10000.0

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        freqs = jnp.exp(jnp.arange(half) * -(math.log(self.theta) / (half - 1)))
        emb = t[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class RandomOrLearnedSinusoidalPosEmb(nn.Module):
    dim: int
    is_random: bool = False

    @nn.compact
    def __call__(self, t):
        half = self.dim // 2
        w = self.param("weights", nn.initializers.normal(1.0), (half,))
        if self.is_random:
            w = jax.lax.stop_gradient(w)
        freqs = t[:, None] * w[None, :] * 2 * math.pi
        return jnp.concatenate([t[:, None], jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class Block1d(nn.Module):
    dim_out: int
    groups: int = 8
    legacy: bool = False  # legacy file uses SiLU, the RDM port uses GELU

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = nn.Conv(self.dim_out, (3,), padding="SAME", name="proj")(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="norm")(x)  # torch eps
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return jax.nn.silu(x) if self.legacy else jax.nn.gelu(x)


class ResnetBlock1d(nn.Module):
    """Two conditioning variants exist in the reference:

    * RDM port (``models/unet1d.py:100-135``): separate GELU+Dense
      projections of time and class embeddings, summed into a
      (scale, shift) = (e, e) FiLM applied in block2;
    * legacy original (``...diffusion.py:221-250``): ONE
      SiLU+Dense(2*dim_out) over cat(time, class) chunked into
      (scale, shift), applied in block1.
    """
    dim_out: int
    groups: int = 8
    legacy: bool = False

    @nn.compact
    def __call__(self, x, temb=None, cemb=None):
        if self.legacy:
            scale_shift = None
            if temb is not None or cemb is not None:
                cond = jnp.concatenate(
                    [e for e in (temb, cemb) if e is not None], axis=-1)
                cond = nn.Dense(self.dim_out * 2,
                                name="cond_mlp")(jax.nn.silu(cond))[:, None, :]
                scale_shift = tuple(jnp.split(cond, 2, axis=-1))
            h = Block1d(self.dim_out, self.groups, legacy=True,
                        name="block1")(x, scale_shift)
            h = Block1d(self.dim_out, self.groups, legacy=True,
                        name="block2")(h)
            if x.shape[-1] != self.dim_out:
                x = nn.Conv(self.dim_out, (1,), name="res_conv")(x)
            return h + x

        h = Block1d(self.dim_out, self.groups, name="block1")(x)
        scale_shift = None
        if temb is not None:
            te = nn.Dense(self.dim_out, name="time_proj")(jax.nn.gelu(temb))[:, None, :]
            scale_shift = (te, te)
        if cemb is not None:
            ce = nn.Dense(self.dim_out, name="class_proj")(jax.nn.gelu(cemb))[:, None, :]
            scale_shift = ((scale_shift[0] + ce, scale_shift[1] + ce)
                           if scale_shift is not None else (ce, ce))
        h = Block1d(self.dim_out, self.groups, name="block2")(h, scale_shift)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1,), name="res_conv")(x)
        return h + x


class LinearAttention1d(nn.Module):
    """Two variants again: the RDM port (``models/unet1d.py:137-153``,
    q softmax over length / k over channel, plain Conv out) and the legacy
    original (``...diffusion.py:253-281``, q softmax over channel scaled,
    k over length, kv-context form, Conv+RMSNorm out)."""
    heads: int = 4
    dim_head: int = 32
    legacy: bool = False

    @nn.compact
    def __call__(self, x):
        B, L, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1,), use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # (B, L, H*D) -> (B, H, D, L)
            return t.reshape(B, L, self.heads, self.dim_head).transpose(0, 2, 3, 1)

        q, k, v = heads(q), heads(k), heads(v)
        if self.legacy:
            q = jax.nn.softmax(q, axis=-2) * self.dim_head**-0.5  # over D
            k = jax.nn.softmax(k, axis=-1)                        # over L
            context = jnp.einsum("bhdn,bhen->bhde", k, v)
            out = jnp.einsum("bhde,bhdn->bhen", context, q)
            out = out.transpose(0, 3, 1, 2).reshape(B, L, hidden)
            out = nn.Conv(C, (1,), name="to_out")(out)
            return RMSNorm1d(name="to_out_norm")(out)
        q = jax.nn.softmax(q, axis=-1)   # over L (torch dim=-1)
        k = jax.nn.softmax(k, axis=-2)   # over D (torch dim=-2)
        context = jnp.einsum("bhdk,bhdl->bhkl", k, v)
        out = jnp.einsum("bhdk,bhkl->bhdl", q, context)
        out = out.transpose(0, 3, 1, 2).reshape(B, L, hidden)
        return nn.Conv(C, (1,), name="to_out")(out)


class Attention1d(nn.Module):
    """Correct full attention (legacy ``...diffusion.py:284-306``)."""
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        B, L, C = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1,), use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # (B, L, H*D) -> (B, H, L, D)
            return t.reshape(B, L, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        sim = jnp.einsum("bhid,bhjd->bhij", q * self.dim_head**-0.5, k,
                         preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(sim, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, hidden)
        return nn.Conv(C, (1,), name="to_out")(out)


class PreNormResidual(nn.Module):
    """Residual(PreNorm(attention)).  The inner module is constructed HERE
    (name="fn") — passing a constructed module as a field would bind its
    params to the outer scope."""
    attn: str  # "linear" | "full"
    heads: int = 4
    dim_head: int = 32
    legacy: bool = False

    @nn.compact
    def __call__(self, x):
        h = RMSNorm1d(name="norm")(x)
        if self.attn == "linear":
            fn = LinearAttention1d(self.heads, self.dim_head,
                                   legacy=self.legacy, name="fn")
        else:
            fn = Attention1d(self.heads, self.dim_head, name="fn")
        return fn(h) + x


@register_model(name="unet1d")
class UNet1D(nn.Module):
    dim: int = 64
    class_dim: int = 1
    seq_length: int = 67
    channels: int = 1
    dim_mults: Sequence[int] = (1, 2, 4)
    embed_class_layers_dims: Sequence[int] = (64, 64)
    cond_drop_prob: float = 0.5
    mask_val: float = 0.0
    init_dim: Optional[int] = None
    out_dim: Optional[int] = None
    resnet_block_groups: int = 4
    learned_variance: bool = False
    learned_sinusoidal_cond: bool = False
    random_fourier_features: bool = False
    learned_sinusoidal_dim: int = 16
    sinusoidal_pos_emb_theta: float = 10000.0
    attn_dim_head: int = 32
    attn_heads: int = 4
    self_condition: bool = False
    legacy: bool = False  # legacy GTO_Halo_DM semantics vs the RDM port
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_config(cls, config):
        m = config.model
        return cls(
            dim=m.dim, class_dim=m.class_dim, seq_length=m.seq_length,
            channels=m.get("channels", 1), dim_mults=tuple(m.dim_mults),
            embed_class_layers_dims=tuple(m.embed_class_layers_dims),
            cond_drop_prob=m.get("cond_drop_prob", 0.5),
            mask_val=m.get("mask_val", 0.0),
            resnet_block_groups=m.get("resnet_block_groups", 4),
            learned_variance=m.get("learned_variance", False),
            learned_sinusoidal_cond=m.get("learned_sinusoidal_cond", False),
            random_fourier_features=m.get("random_fourier_features", False),
            learned_sinusoidal_dim=m.get("learned_sinusoidal_dim", 16),
            sinusoidal_pos_emb_theta=m.get("sinusoidal_pos_emb_theta", 10000),
            attn_dim_head=m.get("attn_dim_head", 32),
            attn_heads=m.get("attn_heads", 4),
            self_condition=m.get("self_condition", False),
        )

    @nn.compact
    def __call__(self, x, time, class_labels=None, *, cond_drop_prob=None,
                 train: bool = False):
        """x: (B, L, C) with L == seq_length; time: (B,) discrete or
        continuous; class_labels: (B, class_dim)."""
        B, L, C = x.shape
        if class_labels is None:
            class_labels = jnp.zeros((B, self.class_dim), x.dtype)
        p = self.cond_drop_prob if cond_drop_prob is None else cond_drop_prob

        # classifier-free-guidance label dropout toward mask_val
        if isinstance(p, (int, float)) and p == 0:
            cl = class_labels
        elif isinstance(p, (int, float)) and p == 1:
            cl = jnp.full_like(class_labels, self.mask_val)
        else:
            keep = jax.random.uniform(self.make_rng("cond_drop"), (B, 1)) >= p
            cl = jnp.where(keep, class_labels,
                           jnp.full_like(class_labels, self.mask_val))

        # class MLP: Dense+GELU per layer, last GELU popped
        c = cl
        for i, dim_out in enumerate(self.embed_class_layers_dims):
            c = nn.Dense(dim_out, name=f"classes_mlp{i}")(c)
            if i < len(self.embed_class_layers_dims) - 1:
                c = jax.nn.gelu(c)

        # time embedding
        if self.learned_sinusoidal_cond or self.random_fourier_features:
            temb = RandomOrLearnedSinusoidalPosEmb(
                self.learned_sinusoidal_dim, self.random_fourier_features,
                name="sinu_pos_emb")(time)
        else:
            temb = SinusoidalPosEmb(self.dim, self.sinusoidal_pos_emb_theta,
                                    name="sinu_pos_emb")(time)
        temb = nn.Dense(self.dim * 4, name="time_mlp0")(temb)
        temb = nn.Dense(self.dim * 4, name="time_mlp1")(jax.nn.gelu(temb))

        init_dim = self.init_dim or self.dim
        dims = [init_dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        groups = self.resnet_block_groups

        x = nn.Conv(init_dim, (7,), padding="SAME", name="init_conv")(x)
        r = x

        hs = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= len(in_out) - 1
            x = ResnetBlock1d(dim_in, groups, legacy=self.legacy,
                              name=f"down{ind}_block1")(x, temb, c)
            hs.append(x)
            x = ResnetBlock1d(dim_in, groups, legacy=self.legacy,
                              name=f"down{ind}_block2")(x, temb, c)
            x = PreNormResidual("linear", self.attn_heads, self.attn_dim_head,
                                legacy=self.legacy,
                                name=f"down{ind}_attn")(x)
            hs.append(x)
            if not is_last:
                # torch Conv1d(k4, s2, p1): pad 1 both sides, VALID stride 2
                xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
                x = nn.Conv(dim_out, (4,), strides=(2,), padding="VALID",
                            name=f"down{ind}_downsample")(xp)
            else:
                x = nn.Conv(dim_out, (3,), padding="SAME",
                            name=f"down{ind}_downsample")(x)

        mid = dims[-1]
        x = ResnetBlock1d(mid, groups, legacy=self.legacy,
                          name="mid_block1")(x, temb, c)
        x = PreNormResidual("full", self.attn_heads, self.attn_dim_head,
                            name="mid_attn")(x)
        x = ResnetBlock1d(mid, groups, legacy=self.legacy,
                          name="mid_block2")(x, temb, c)

        n = len(in_out)
        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == n - 1
            is_second_last = ind == n - 2
            is_third_last = ind == n - 3
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResnetBlock1d(dim_out, groups, legacy=self.legacy,
                              name=f"up{ind}_block1")(x, temb, c)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResnetBlock1d(dim_out, groups, legacy=self.legacy,
                              name=f"up{ind}_block2")(x, temb, c)
            x = PreNormResidual("linear", self.attn_heads, self.attn_dim_head,
                                legacy=self.legacy,
                                name=f"up{ind}_attn")(x)
            if is_third_last:
                x = _nearest_resize_1d(x, int(self.seq_length / 2))
                x = nn.Conv(dim_in, (3,), padding="SAME", name=f"up{ind}_upsample")(x)
            elif is_second_last:
                x = _nearest_resize_1d(x, self.seq_length)
                x = nn.Conv(dim_in, (3,), padding="SAME", name=f"up{ind}_upsample")(x)
            elif is_last:
                x = nn.Conv(dim_in, (3,), padding="SAME", name=f"up{ind}_upsample")(x)
            else:
                x = _nearest_resize_1d(x, x.shape[1] * 2)
                x = nn.Conv(dim_in, (3,), padding="SAME", name=f"up{ind}_upsample")(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlock1d(self.dim, groups, legacy=self.legacy,
                          name="final_res_block")(x, temb, c)
        out_dim = self.out_dim or self.channels * (2 if self.learned_variance else 1)
        return nn.Conv(out_dim, (1,), name="final_conv")(x)

    def forward_with_cond_scale(self, params, x, time, class_labels,
                                cond_scale: float = 1.0, rescaled_phi: float = 0.0):
        """CFG inference (legacy ``...diffusion.py:476-507``) as ONE 2B-batch
        forward: [labels ; mask_val] through a single apply."""
        if cond_scale == 1.0:
            # Reference early-return (``...diffusion.py:486-487``): at
            # cond_scale 1 the combination is identically the conditional
            # logits, so run ONE B-batch forward — bit-identical to the
            # plain forward (a 2B-batch evaluation tiles differently and
            # drifts ~1e-6) and half the FLOPs.
            return self.apply({"params": params}, x, time, class_labels,
                              cond_drop_prob=0.0)
        B = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([time, time], axis=0)
        null = jnp.full_like(class_labels, self.mask_val)
        cl2 = jnp.concatenate([class_labels, null], axis=0)
        out = self.apply({"params": params}, x2, t2, cl2, cond_drop_prob=0.0)
        logits, null_logits = out[:B], out[B:]
        scaled = null_logits + (logits - null_logits) * cond_scale
        if rescaled_phi == 0.0:
            return scaled
        dims = tuple(range(1, scaled.ndim))
        std_l = jnp.std(logits, axis=dims, keepdims=True)
        std_s = jnp.std(scaled, axis=dims, keepdims=True)
        rescaled = scaled * (std_l / (std_s + 1e-6))
        rescaled = jnp.where(jnp.isnan(rescaled), scaled, rescaled)
        return rescaled * rescaled_phi + scaled * (1.0 - rescaled_phi)
