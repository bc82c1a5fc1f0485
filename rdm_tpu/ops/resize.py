"""Nearest-neighbour resampling with PyTorch ``F.interpolate(mode='nearest')``
semantics.

The reference NCSN++ relies on torch-nearest in two places:
  * ``layerspp.Upsample`` (``layerspp.py:125``): exact 2x upsample.
  * odd-size skip fixups in the up path (``ncsnpp.py:319-320``): resize to
    an arbitrary target size (8 -> 9 on the 9x9 GTO images).

torch-nearest picks source index ``floor(i * in / out)``; ``jax.image.resize``
uses a half-pixel-centred rule that differs on odd sizes, which would break
weight-import parity.  We implement the torch rule directly with gathers.

Layout note: this module is NHWC (TPU-native); the reference is NCHW.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def upsample2x_nearest(x):
    """Exact 2x nearest upsample of an NHWC tensor (each pixel -> 2x2)."""
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


def nearest_resize(x, size):
    """Resize NHWC tensor ``x`` to spatial ``size=(H, W)`` with torch-nearest
    index semantics: ``src = floor(dst * in / out)``."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x
    # Static index maps (sizes are compile-time constants under jit).
    rows = np.floor(np.arange(h_out) * h_in / h_out).astype(np.int32)
    cols = np.floor(np.arange(w_out) * w_in / w_out).astype(np.int32)
    return x[:, rows][:, :, cols]
