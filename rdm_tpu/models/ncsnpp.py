"""NCSN++ score network, TPU-native Flax/NHWC rebuild.

Architecture semantics match the reference exactly
(``Reflected-Diffusion/models/ncsnpp.py:24-354``), including its
non-standard skip topology:

* down path pushes one skip per resblock PLUS one extra per resolution
  (``ncsnpp.py:150-171``), giving ``num_res_blocks + 1`` up blocks per
  resolution with the explicit skip-channel bookkeeping asserted there;
* odd-size spatial path 9 -> 4 -> 2 via pad+stride-2 conv, with
  torch-nearest resize fixups in the up path when the upsampled feature
  (8x8) meets a 9x9 skip (``ncsnpp.py:319-320``);
* Fourier time embedding of ``log(sigma)`` (``ncsnpp.py:252``), time MLP
  2nf -> 4nf -> 4nf, additive label embedding, cond-drop masking for
  classifier-free guidance during training (``ncsnpp.py:242-246``).

GTO config (``configs/model/ncsnpp.yaml``): nf=64, ch_mult=[1,2,2],
2 res blocks, attention at resolution 9 (81-token), channels=1, 9x9 input,
swish, dropout 0.2, skip_rescale, ema 0.999, cond_drop_prob 0.5.

Layout is NHWC; ``rdm_tpu.models.torch_import`` maps reference NCHW/OIHW
checkpoints into this parameter tree for parity testing.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (AttnBlockpp, Conv3x3, Downsample, GaussianFourierProjection,
                     ResnetBlockDDPMpp, Upsample, get_act, group_count,
                     torch_linear_init)
from .registry import register_model


@register_model(name="ncsnpp")
class NCSNpp(nn.Module):
    nf: int = 64
    ch_mult: Sequence[int] = (1, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (9,)
    dropout: float = 0.2
    resamp_with_conv: bool = True
    conditional: bool = True
    cond_drop_prob: float = 0.5
    num_classes: int = 1
    init_scale: float = 0.0
    skip_rescale: bool = True
    image_size: int = 9
    image_width: int = 9
    channels: int = 1
    scale_by_sigma: bool = False
    fourier_scale: float = 16.0
    nonlinearity: str = "swish"
    dtype: jnp.dtype = jnp.float32
    attn_pallas: bool = False      # fused VMEM attention blocks (TPU only)
    attn_softmax_f32: bool = True  # f32 attention softmax (parity default)
    resblock_pallas: bool = False  # fused VMEM resblocks (bf16 only)

    @classmethod
    def from_config(cls, config):
        m = config.model
        d = config.get("data", {})
        # geometry lives in the data group for the image configs
        # (reference NCSNpp reads config.data.image_size/num_channels);
        # the GTO model config carries its own copy — model wins.
        image_size = m.get("image_size", d.get("image_size", 9))
        channels = m.get("channels", d.get("num_channels", 1))
        return cls(
            nf=m.nf, ch_mult=tuple(m.ch_mult), num_res_blocks=m.num_res_blocks,
            attn_resolutions=tuple(m.attn_resolutions), dropout=m.dropout,
            resamp_with_conv=m.resamp_with_conv, conditional=m.conditional,
            cond_drop_prob=m.get("cond_drop_prob", 0.0),
            num_classes=m.get("num_classes", d.get("num_classes", 1)),
            init_scale=m.init_scale,
            skip_rescale=m.skip_rescale, image_size=image_size,
            image_width=m.get("image_width", image_size), channels=channels,
            scale_by_sigma=m.get("scale_by_sigma", False),
            fourier_scale=m.fourier_scale, nonlinearity=m.nonlinearity,
            dtype=jnp.bfloat16 if m.get("precision") == "bfloat16" else jnp.float32,
            attn_pallas=bool(m.get("attn_pallas", False)),
            resblock_pallas=bool(m.get("resblock_pallas", False)),
        )

    def _has_attn(self, level: int) -> bool:
        # Reference checks `image_size // 2**level in attn_resolutions`
        # (``ncsnpp.py:145,177,203``) — nominal, not actual, resolution.
        return self.image_size // (2 ** level) in self.attn_resolutions

    @nn.compact
    def __call__(self, x, time_cond, class_labels=None, *, train: bool = False):
        """Args:
          x: [B, H, W, C] input (NHWC).
          time_cond: [B] noise level (the marginal sigma, NOT raw t).
          class_labels: optional [B, num_classes].
          train: enables dropout and cond-drop label masking.
        """
        act = get_act(self.nonlinearity)
        nf = self.nf
        levels = len(self.ch_mult)

        # Classifier-free guidance label dropout (``ncsnpp.py:242-246``).
        if self.conditional and class_labels is None:
            class_labels = jnp.zeros((x.shape[0], self.num_classes), x.dtype)
        if self.conditional and train and self.cond_drop_prob > 0:
            rng = self.make_rng("cond_drop")
            mask = (jax.random.uniform(rng, (x.shape[0], 1)) < self.cond_drop_prob)
            class_labels = class_labels * (1.0 - mask.astype(class_labels.dtype))

        # Fourier time embedding of log(sigma) (``ncsnpp.py:250-256``).
        temb = GaussianFourierProjection(
            embedding_size=nf, scale=self.fourier_scale,
            name="time_embed")(jnp.log(time_cond))
        temb = nn.Dense(nf * 4, kernel_init=torch_linear_init(),
                        name="time_mlp0", dtype=self.dtype)(temb)
        temb = act(temb)
        temb = nn.Dense(nf * 4, kernel_init=torch_linear_init(),
                        name="time_mlp1", dtype=self.dtype)(temb)
        if self.conditional:
            temb = temb + nn.Dense(nf * 4, kernel_init=torch_linear_init(),
                                   name="label_emb", dtype=self.dtype)(class_labels)

        def resblock(out_ch, name):
            return ResnetBlockDDPMpp(act=act, out_ch=out_ch, dropout=self.dropout,
                                     skip_rescale=self.skip_rescale,
                                     init_scale=self.init_scale,
                                     use_pallas=self.resblock_pallas,
                                     name=name, dtype=self.dtype)

        def attnblock(name):
            return AttnBlockpp(skip_rescale=self.skip_rescale,
                               init_scale=self.init_scale,
                               use_pallas=self.attn_pallas,
                               softmax_f32=self.attn_softmax_f32,
                               name=name, dtype=self.dtype)

        # ----- down path (``ncsnpp.py:265-290``) --------------------------
        h = Conv3x3(nf, name="input_conv", dtype=self.dtype)(x)
        hs = [h]
        k = 0
        for i, mult in enumerate(self.ch_mult):
            out_ch = nf * mult
            for _ in range(self.num_res_blocks):
                h = resblock(out_ch, f"db{k}")(h, temb, train=train)
                if self._has_attn(i):
                    h = attnblock(f"da{k}")(h)
                hs.append(h)
                k += 1
            hs.append(h)  # extra skip per resolution (``ncsnpp.py:283``)
            if i != levels - 1:
                h = Downsample(with_conv=self.resamp_with_conv,
                               name=f"ds{i}", dtype=self.dtype)(h)

        # ----- bottleneck (``ncsnpp.py:292-300``) -------------------------
        h = resblock(h.shape[-1], "mid_block1")(h, temb, train=train)
        if self._has_attn(levels - 1):
            h = attnblock("mid_attn")(h)
        h = resblock(h.shape[-1], "mid_block2")(h, temb, train=train)

        # ----- up path (``ncsnpp.py:302-337``) ----------------------------
        from rdm_tpu.ops.resize import nearest_resize
        k = 0
        for j, i in enumerate(reversed(range(levels))):
            out_ch = nf * self.ch_mult[i]
            for _ in range(self.num_res_blocks + 1):
                h_skip = hs.pop()
                if h.shape[1:3] != h_skip.shape[1:3]:
                    h = nearest_resize(h, h_skip.shape[1:3])
                h = jnp.concatenate([h, h_skip], axis=-1)
                h = resblock(out_ch, f"ub{k}")(h, temb, train=train)
                if self._has_attn(i):
                    h = attnblock(f"ua{k}")(h)
                k += 1
            if i != 0:
                h = Upsample(with_conv=self.resamp_with_conv,
                             name=f"us{j}", dtype=self.dtype)(h)
        # The reference pushes the input-conv features as hs[0] but its up
        # path pops only (num_res_blocks+1)*levels skips, so hs[0] is never
        # consumed (``ncsnpp.py:266,302-337``) — we mirror that exactly.
        assert len(hs) == 1

        # ----- output head (``ncsnpp.py:339-351``) ------------------------
        h = nn.GroupNorm(num_groups=group_count(h.shape[-1]), epsilon=1e-6,
                         name="out_norm", dtype=self.dtype)(h)
        h = act(h)
        h = Conv3x3(self.channels, init_scale=self.init_scale,
                    name="out_conv", dtype=self.dtype)(h)

        if self.scale_by_sigma:
            h = h / time_cond.reshape(-1, 1, 1, 1)
        return h
