"""StyleGAN2-style FIR resampling (NHWC, pure jnp).

Rebuild of reference ``models/up_or_down_sampling.py``.  The reference's
simplified ``upfirdn2d`` only supports pad+correlate (no up/down factors),
which makes its ``upsample_2d``/``downsample_2d`` raise TypeError (they
pass unsupported kwargs) — dead code since all live configs set
``fir: false``.  Here ``upfirdn2d`` is the full primitive (upsample,
FIR, downsample) so every derived op works; the fused
``upsample_conv_2d``/``conv_downsample_2d`` paths match the reference's
torch numerics (validated in tests).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _setup_kernel(k):
    k = np.asarray(k, np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum()
    assert k.ndim == 2 and k.shape[0] == k.shape[1]
    return k


def upfirdn2d(x, f, up: int = 1, down: int = 1, pad=(0, 0)):
    """x: (N, H, W, C); f: 2-D filter.  Upsample by zero-stuffing, pad,
    CONVOLVE with f (the reference correlates with the flipped filter,
    i.e. true convolution), then downsample."""
    if isinstance(pad, int):
        pad = (pad, pad, pad, pad)
    elif len(pad) == 2:
        pad = (pad[0], pad[1], pad[0], pad[1])
    px0, px1, py0, py1 = pad[0], pad[1], pad[2], pad[3]
    N, H, W, C = x.shape
    f = jnp.asarray(f, x.dtype)
    fh, fw = f.shape

    if up > 1:
        x = jnp.pad(
            x.reshape(N, H, 1, W, 1, C),
            ((0, 0), (0, 0), (0, up - 1), (0, 0), (0, up - 1), (0, 0)),
        ).reshape(N, H * up, W * up, C)
    x = jnp.pad(x, ((0, 0), (max(py0, 0), max(py1, 0)),
                    (max(px0, 0), max(px1, 0)), (0, 0)))
    if min(px0, px1, py0, py1) < 0:  # negative pad = crop
        x = x[:, max(-py0, 0): x.shape[1] - max(-py1, 0),
              max(-px0, 0): x.shape[2] - max(-px1, 0)]

    # depthwise convolution with the flipped filter (== torch reference)
    kern = jnp.tile(jnp.flip(f)[:, :, None, None], (1, 1, 1, C))
    x = jax.lax.conv_general_dilated(
        x, kern, window_strides=(down, down), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    return x


def upsample_2d(x, k=None, factor: int = 2, gain: float = 1.0):
    if k is None:
        k = [1] * factor
    k = _setup_kernel(k) * (gain * factor**2)
    p = k.shape[0] - factor
    return upfirdn2d(x, k, up=factor, pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample_2d(x, k=None, factor: int = 2, gain: float = 1.0):
    if k is None:
        k = [1] * factor
    k = _setup_kernel(k) * gain
    p = k.shape[0] - factor
    return upfirdn2d(x, k, down=factor, pad=((p + 1) // 2, p // 2))


def naive_upsample_2d(x, factor: int = 2):
    N, H, W, C = x.shape
    x = x.reshape(N, H, 1, W, 1, C)
    x = jnp.tile(x, (1, 1, factor, 1, factor, 1))
    return x.reshape(N, H * factor, W * factor, C)


def naive_downsample_2d(x, factor: int = 2):
    N, H, W, C = x.shape
    x = x.reshape(N, H // factor, factor, W // factor, factor, C)
    return jnp.mean(x, axis=(2, 4))


def upsample_conv_2d(x, w, k=None, factor: int = 2, gain: float = 1.0):
    """Fused upsample + conv (reference ``up_or_down_sampling.py:94-150``).

    x: (N, H, W, C); w: (kh, kw, inC, outC) HWIO.
    """
    assert w.shape[0] == w.shape[1]
    convH = w.shape[0]
    if k is None:
        k = [1] * factor
    k = _setup_kernel(k) * (gain * factor**2)
    p = (k.shape[0] - factor) - (convH - 1)

    # torch conv_transpose2d(x, w_flipped_grouped, stride=factor, padding=0)
    # == input-dilated convolution with the (unflipped) kernel and full
    # padding convH-1, plus output_padding rows/cols bottom-right.
    N, H, W, C = x.shape
    stride = factor
    out_h = (H - 1) * stride + convH
    output_padding = out_h - ((H - 1) * stride + convH)  # 0 by construction
    x = jax.lax.conv_general_dilated(
        x, jnp.asarray(w, x.dtype), window_strides=(1, 1),
        padding=[(convH - 1, convH - 1 + output_padding),
                 (convH - 1, convH - 1 + output_padding)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return upfirdn2d(x, k, pad=((p + 1) // 2 + factor - 1, p // 2 + 1))


def conv_downsample_2d(x, w, k=None, factor: int = 2, gain: float = 1.0):
    """Fused FIR + strided conv (reference ``:152-186``)."""
    convH = w.shape[0]
    if k is None:
        k = [1] * factor
    k = _setup_kernel(k) * gain
    p = (k.shape[0] - factor) + (convH - 1)
    x = upfirdn2d(x, k, pad=((p + 1) // 2, p // 2))
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(w, x.dtype), window_strides=(factor, factor),
        padding=[(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
