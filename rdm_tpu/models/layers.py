"""Building blocks for the TPU-native NCSN++ (Flax / NHWC).

Semantics rebuilt from the reference layer zoo
(``Reflected-Diffusion/models/layers.py`` and ``layerspp.py``); layout is
NHWC end-to-end (TPU native), initializers match the reference:

* ``default_init`` = JAX-style ``variance_scaling(scale, fan_avg, uniform)``
  (reference ``layers.py:39-77``), with scale 0 mapped to 1e-10.
* ``NIN`` (1x1 "network-in-network" dense over channels, reference
  ``layers.py:531-540``) with init_scale 0.1 default.
* GroupNorm uses ``num_groups = min(C // 4, 32)``, eps 1e-6 throughout
  (reference ``layerspp.py:74, 176, 190``).
* torch-Linear-equivalent init for the time MLP / label embedding
  (kaiming_uniform(a=sqrt(5)) == variance_scaling(1/3, fan_in, uniform)).
"""
from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# --------------------------------------------------------------------------
# Initializers


def default_init(scale: float = 1.0):
    """DDPM initializer (reference ``layers.py:73-77``)."""
    scale = 1e-10 if scale == 0 else scale
    return nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


def torch_linear_init():
    """torch ``nn.Linear`` default weight init: kaiming_uniform(a=sqrt(5))
    == U(+-1/sqrt(fan_in)) == variance_scaling(1/3, fan_in, uniform)."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def get_act(name: str) -> Callable:
    """Activation registry (reference ``layers.py:14-26``)."""
    name = name.lower()
    if name == "elu":
        return jax.nn.elu
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
    if name == "swish":
        return jax.nn.silu
    raise NotImplementedError(f"activation {name} does not exist")


def group_count(channels: int) -> int:
    return min(channels // 4, 32)


# --------------------------------------------------------------------------
# Modules


class Conv3x3(nn.Module):
    """3x3 conv, DDPM init, SAME padding (reference ``layers.py:103-110``)."""
    out_ch: int
    init_scale: float = 1.0
    stride: int = 1
    padding: str | Sequence = "SAME"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_ch, (3, 3), strides=(self.stride, self.stride),
                       padding=self.padding, use_bias=True,
                       kernel_init=default_init(self.init_scale),
                       bias_init=nn.initializers.zeros,
                       dtype=self.dtype, name="conv")(x)


class Conv1x1(nn.Module):
    """1x1 conv, DDPM init (reference ``layers.py:85-90``)."""
    out_ch: int
    init_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_ch, (1, 1), use_bias=True,
                       kernel_init=default_init(self.init_scale),
                       bias_init=nn.initializers.zeros,
                       dtype=self.dtype, name="conv")(x)


class NIN(nn.Module):
    """Channel-wise dense (reference ``layers.py:531-540``). NHWC makes this
    a plain trailing-axis matmul — exactly what the MXU wants."""
    num_units: int
    init_scale: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        W = self.param("W", default_init(self.init_scale), (in_dim, self.num_units))
        b = self.param("b", nn.initializers.zeros, (self.num_units,))
        y = jnp.einsum("...c,cd->...d", x.astype(self.dtype), W.astype(self.dtype))
        return y + b.astype(self.dtype)


class _NINParams(nn.Module):
    """Parameter holder producing the SAME tree as :class:`NIN` (W, b) but
    returning the raw values — used by the fused Pallas attention path so
    both paths share one checkpoint format."""
    num_units: int
    init_scale: float = 0.1

    @nn.compact
    def __call__(self, in_dim):
        W = self.param("W", default_init(self.init_scale), (in_dim, self.num_units))
        b = self.param("b", nn.initializers.zeros, (self.num_units,))
        return W, b


class _GNParams(nn.Module):
    """Parameter holder matching ``nn.GroupNorm``'s tree (scale, bias)."""

    @nn.compact
    def __call__(self, channels):
        scale = self.param("scale", nn.initializers.ones, (channels,))
        bias = self.param("bias", nn.initializers.zeros, (channels,))
        return scale, bias


class _ConvInnerParams(nn.Module):
    """Params matching ``nn.Conv`` (kernel HWIO, bias)."""
    kh: int
    kw: int
    out_ch: int
    init_scale: float = 1.0

    @nn.compact
    def __call__(self, in_ch):
        kernel = self.param("kernel", default_init(self.init_scale),
                            (self.kh, self.kw, in_ch, self.out_ch))
        bias = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        return kernel, bias


class _Conv3x3Params(nn.Module):
    """Parameter holder matching :class:`Conv3x3`'s tree (conv/kernel, bias)."""
    out_ch: int
    init_scale: float = 1.0

    @nn.compact
    def __call__(self, in_ch):
        return _ConvInnerParams(3, 3, self.out_ch, self.init_scale,
                                name="conv")(in_ch)


class _DenseParams(nn.Module):
    """Parameter holder matching ``nn.Dense`` (kernel, bias)."""
    features: int

    @nn.compact
    def __call__(self, in_features):
        kernel = self.param("kernel", default_init(), (in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class GaussianFourierProjection(nn.Module):
    """sin/cos(2 pi W x) time embedding with fixed W ~ N(0, scale^2)
    (reference ``layerspp.py:19-28``).  W is a parameter for checkpoint
    parity but frozen via stop_gradient (torch marks it requires_grad=False).
    """
    embedding_size: int = 256
    scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        W = self.param("W", nn.initializers.normal(stddev=self.scale),
                       (self.embedding_size,))
        W = jax.lax.stop_gradient(W)
        x_proj = x[:, None] * W[None, :] * 2 * math.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class AttnBlockpp(nn.Module):
    """Full-spatial self-attention (reference ``layerspp.py:67-96``).

    At GTO scale this is 81-token attention over <=128 channels.  The
    attention matrix (B, 81, 81) dominates the whole network's HBM traffic
    (profiled: ~63% of the NCSN++ step at batch 2048), so two fast paths
    exist:

    * ``softmax_f32=False``: keep the attention matrix in the compute dtype
      (bf16) — halves the HBM traffic with negligible effect at 81 tokens
      (softmax is max-subtracted; values are O(1)).
    * ``use_pallas=True``: the fused VMEM-resident kernel in
      ``rdm_tpu.ops.pallas.attention`` (GN + qkv + softmax + proj +
      residual in one pass, nothing spilled to HBM).
    """
    skip_rescale: bool = False
    init_scale: float = 0.0
    dtype: jnp.dtype = jnp.float32
    softmax_f32: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        # The fused kernel is exercised/tuned for bf16 activations (f32
        # tiles trip a Mosaic layout check on jax 0.9); other dtypes fall
        # back to the XLA path transparently.
        if self.use_pallas and self.dtype == jnp.bfloat16:
            from rdm_tpu.ops.pallas.attention import fused_attn_block
            gn_scale, gn_bias = _GNParams(name="norm")(C)
            wq, bq = _NINParams(C, name="q")(C)
            wk, bk = _NINParams(C, name="k")(C)
            wv, bv = _NINParams(C, name="v")(C)
            wp, bp = _NINParams(C, init_scale=self.init_scale, name="proj")(C)
            return fused_attn_block(
                x.astype(self.dtype), gn_scale, gn_bias, wq, bq, wk, bk,
                wv, bv, wp, bp, groups=group_count(C),
                skip_rescale=self.skip_rescale, softmax_f32=self.softmax_f32)

        h = nn.GroupNorm(num_groups=group_count(C), epsilon=1e-6,
                         dtype=self.dtype, name="norm")(x)
        q = NIN(C, name="q", dtype=self.dtype)(h)
        k = NIN(C, name="k", dtype=self.dtype)(h)
        v = NIN(C, name="v", dtype=self.dtype)(h)

        q = q.reshape(B, H * W, C)
        k = k.reshape(B, H * W, C)
        v = v.reshape(B, H * W, C)
        acc_t = jnp.float32 if self.softmax_f32 else self.dtype
        w = jnp.einsum("bqc,bkc->bqk", q, k,
                       preferred_element_type=acc_t) * (int(C) ** -0.5)
        w = jax.nn.softmax(w.astype(acc_t), axis=-1).astype(x.dtype)
        h = jnp.einsum("bqk,bkc->bqc", w, v)
        h = h.reshape(B, H, W, C)
        h = NIN(C, init_scale=self.init_scale, name="proj", dtype=self.dtype)(h)
        out = x + h
        return out / math.sqrt(2.0) if self.skip_rescale else out


class ResnetBlockDDPMpp(nn.Module):
    """GN -> act -> conv3x3 -> +time -> GN -> act -> dropout -> conv3x3(0-init)
    with NIN shortcut and /sqrt(2) skip rescale (reference
    ``layerspp.py:171-214``).

    ``use_pallas`` routes through the fused VMEM kernel
    (``rdm_tpu.ops.pallas.resblock``: both GNs, both convs as shifted
    batched matmuls, temb bias, shortcut, residual in one pass) — used when
    compute dtype is bf16 and dropout is inactive; identical checkpoint
    tree either way (param-holder modules)."""
    act: Callable
    out_ch: int
    dropout: float = 0.1
    skip_rescale: bool = False
    init_scale: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, temb=None, *, train: bool = False):
        in_ch = x.shape[-1]
        dropout_active = train and self.dropout > 0
        if (self.use_pallas and self.dtype == jnp.bfloat16
                and not dropout_active and temb is not None):
            from rdm_tpu.ops.pallas.resblock import fused_resblock
            gns0, gnb0 = _GNParams(name="norm0")(in_ch)
            w0, b0 = _Conv3x3Params(self.out_ch, name="conv0")(in_ch)
            wt, bt = _DenseParams(self.out_ch, name="temb_proj")(temb.shape[-1])
            gns1, gnb1 = _GNParams(name="norm1")(self.out_ch)
            w1, b1 = _Conv3x3Params(self.out_ch, init_scale=self.init_scale,
                                    name="conv1")(self.out_ch)
            wn = bn = None
            if in_ch != self.out_ch:
                wn, bn = _NINParams(self.out_ch, name="shortcut")(in_ch)
            tembv = (self.act(temb).astype(self.dtype) @ wt.astype(self.dtype)
                     + bt.astype(self.dtype))
            return fused_resblock(
                x.astype(self.dtype), tembv, gns0, gnb0, w0, b0, gns1, gnb1,
                w1, b1, wn, bn, groups0=group_count(in_ch),
                groups1=group_count(self.out_ch),
                skip_rescale=self.skip_rescale)
        h = self.act(nn.GroupNorm(num_groups=group_count(in_ch), epsilon=1e-6,
                                  dtype=self.dtype, name="norm0")(x))
        h = Conv3x3(self.out_ch, name="conv0", dtype=self.dtype)(h)
        if temb is not None:
            h = h + nn.Dense(self.out_ch, kernel_init=default_init(),
                             bias_init=nn.initializers.zeros,
                             dtype=self.dtype, name="temb_proj")(self.act(temb))[:, None, None, :]
        h = self.act(nn.GroupNorm(num_groups=group_count(self.out_ch), epsilon=1e-6,
                                  dtype=self.dtype, name="norm1")(h))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = Conv3x3(self.out_ch, init_scale=self.init_scale, name="conv1",
                    dtype=self.dtype)(h)
        if in_ch != self.out_ch:
            x = NIN(self.out_ch, name="shortcut", dtype=self.dtype)(x)
        out = x + h
        return out / math.sqrt(2.0) if self.skip_rescale else out


class Combine(nn.Module):
    """Skip-combiner (reference ``layerspp.py:50-64``): 1x1-conv one input
    then concat or sum with the other."""
    dim2: int
    method: str = "cat"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        h = Conv1x1(self.dim2, name="conv", dtype=self.dtype)(x)
        if self.method == "cat":
            return jnp.concatenate([h, y], axis=-1)
        if self.method == "sum":
            return h + y
        raise ValueError(f"Method {self.method} not recognized.")


class FIRConv2d(nn.Module):
    """StyleGAN2 conv with fused FIR up/down resampling (reference
    ``up_or_down_sampling.Conv2d``; the reference's up path crashes —
    stride/output_padding bug — this is the corrected semantics)."""
    out_ch: int
    kernel: int = 3
    up: bool = False
    down: bool = False
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True
    init_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from rdm_tpu.ops import fir
        in_ch = x.shape[-1]
        w = self.param("weight", default_init(self.init_scale),
                       (self.kernel, self.kernel, in_ch, self.out_ch))
        w = w.astype(self.dtype)
        x = x.astype(self.dtype)
        if self.up:
            x = fir.upsample_conv_2d(x, w, k=self.resample_kernel)
        elif self.down:
            x = fir.conv_downsample_2d(x, w, k=self.resample_kernel)
        else:
            pad = self.kernel // 2
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
            x = x + b.astype(self.dtype)
        return x


class ResnetBlockBigGANpp(nn.Module):
    """BigGAN-style resblock with in-block up/down sampling (reference
    ``layerspp.py:217-279``).  Part of the layer-zoo API surface (the live
    configs use the DDPM block; ``resblock_type: biggan`` in ddpmpp.yaml is
    ignored by the reference NCSNpp, which we mirror)."""
    act: Callable
    out_ch: int
    up: bool = False
    down: bool = False
    dropout: float = 0.1
    fir: bool = False
    fir_kernel: Sequence[int] = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, *, train: bool = False):
        from rdm_tpu.ops import fir as fir_ops
        in_ch = x.shape[-1]
        h = self.act(nn.GroupNorm(num_groups=group_count(in_ch), epsilon=1e-6,
                                  dtype=self.dtype, name="norm0")(x))
        if self.up:
            resample = (lambda t: fir_ops.upsample_2d(t, self.fir_kernel)) \
                if self.fir else fir_ops.naive_upsample_2d
            h, x = resample(h), resample(x)
        elif self.down:
            resample = (lambda t: fir_ops.downsample_2d(t, self.fir_kernel)) \
                if self.fir else fir_ops.naive_downsample_2d
            h, x = resample(h), resample(x)
        h = Conv3x3(self.out_ch, name="conv0", dtype=self.dtype)(h)
        if temb is not None:
            h = h + nn.Dense(self.out_ch, kernel_init=default_init(),
                             bias_init=nn.initializers.zeros, dtype=self.dtype,
                             name="temb_proj")(self.act(temb))[:, None, None, :]
        h = self.act(nn.GroupNorm(num_groups=group_count(self.out_ch),
                                  epsilon=1e-6, dtype=self.dtype,
                                  name="norm1")(h))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = Conv3x3(self.out_ch, init_scale=self.init_scale, name="conv1",
                    dtype=self.dtype)(h)
        if in_ch != self.out_ch or self.up or self.down:
            x = Conv1x1(self.out_ch, name="shortcut", dtype=self.dtype)(x)
        out = x + h
        return out / math.sqrt(2.0) if self.skip_rescale else out


class Upsample(nn.Module):
    """Nearest 2x upsample + optional conv (reference ``layerspp.py:99-131``,
    non-FIR path only: GTO config has ``fir: false``)."""
    with_conv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from rdm_tpu.ops.resize import upsample2x_nearest
        h = upsample2x_nearest(x)
        if self.with_conv:
            h = Conv3x3(x.shape[-1], name="conv", dtype=self.dtype)(h)
        return h


class Downsample(nn.Module):
    """Pad-right/bottom-by-1 then stride-2 VALID conv, or 2x2 avg-pool
    (reference ``layerspp.py:134-168``, non-FIR path)."""
    with_conv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            h = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return Conv3x3(x.shape[-1], stride=2, padding="VALID",
                           name="conv", dtype=self.dtype)(h)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))
