"""Fused VMEM-resident attention core for short token counts.

The NCSN++ attention (reference ``layerspp.py:67-96``) runs over 81 tokens
(9x9 spatial) with <=128 channels.  Under XLA the (B, 81, 81) attention
matrix round-trips HBM around the softmax, which profiling shows is ~60%
of the whole denoiser step at batch 2048 despite being ~1% of the FLOPs.
This kernel computes ``softmax(q k^T / sqrt(C)) v`` for a tile of TB
samples entirely in VMEM: the attention matrix never touches HBM.

Traffic per block drops from ~5 passes over (B,81,81)+(B,81,C) to exactly
read q,k,v + write out.

Used by ``rdm_tpu.models.layers.AttnBlockpp(use_pallas=True)``; numerics
are validated against the XLA path in tests (interpret mode on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, acc_dtype):
    q = q_ref[:]  # (TB, L, C)
    k = k_ref[:]
    v = v_ref[:]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=acc_dtype) * scale        # (TB, L, L)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=acc_dtype)                # (TB, L, C)
    o_ref[:] = o.astype(o_ref.dtype)


def _fused_block_kernel(x_ref, amat_ref, gns_ref, gnb_ref, wq_ref, bq_ref,
                        wk_ref, bk_ref, wv_ref, bv_ref, wp_ref, bp_ref,
                        o_ref, *, eps: float, rescale: float, acc_dtype):
    """Whole AttnBlockpp for one batch tile, VMEM-resident.

    x: (TB, L, C) token layout (the NHWC->token reshape happens outside —
    Mosaic cannot merge non-minor dims in-kernel).  ``amat`` is the (C, C)
    group-averaging matrix A[c, d] = 1/(L * C_g) if group(c) == group(d)
    else 0, so GroupNorm stats become two tiny matmuls instead of
    lane-unfriendly reshapes.
    """
    TB, L, C = x_ref.shape
    x = x_ref[:]
    xf = x.astype(jnp.float32)

    amat = amat_ref[:]
    s1 = jnp.sum(xf, axis=1)                      # (TB, C)
    s2 = jnp.sum(xf * xf, axis=1)
    mu = jnp.dot(s1, amat, preferred_element_type=jnp.float32)    # group mean per channel
    ex2 = jnp.dot(s2, amat, preferred_element_type=jnp.float32)
    var = ex2 - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    h = (xf - mu[:, None, :]) * inv[:, None, :]
    h = h * gns_ref[:].astype(jnp.float32) + gnb_ref[:].astype(jnp.float32)
    h = h.astype(x.dtype)

    def nin(t, w_ref, b_ref):
        # Batched rank-3 dot: Mosaic lowers batch-free rank-3 contractions
        # through an unsupported dim-merging reshape, but batched dots work,
        # so broadcast the (C, C) weight across the tile.
        wb = jnp.broadcast_to(w_ref[:][None], (TB, C, C))
        y = jax.lax.dot_general(t, wb, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=acc_dtype)
        return y.astype(x.dtype) + b_ref[:].astype(x.dtype)

    q = nin(h, wq_ref, bq_ref)
    k = nin(h, wk_ref, bk_ref)
    v = nin(h, wv_ref, bv_ref)

    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * (float(C) ** -0.5)
    mmax = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - mmax)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=acc_dtype).astype(x.dtype)

    o2 = nin(o, wp_ref, bp_ref)
    out = (x + o2) * rescale
    o_ref[:] = out.astype(o_ref.dtype)


def _bdot(a, b, dims, acc=jnp.float32):
    """Batched dot_general helper (batch dim 0)."""
    (lc, rc) = dims
    return jax.lax.dot_general(a, b, (((lc,), (rc,)), ((0,), (0,))),
                               preferred_element_type=acc)


def _fused_block_bwd_kernel(x_ref, g_ref, amat_ref, gns_ref, gnb_ref,
                            wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                            wp_ref, bp_ref,
                            dx_ref, dgns_ref, dgnb_ref, dwq_ref, dbq_ref,
                            dwk_ref, dbk_ref, dwv_ref, dbv_ref, dwp_ref,
                            dbp_ref, *, eps: float, rescale: float, acc_dtype):
    """Backward of the fused block: recompute the forward intermediates in
    VMEM, then chain gradients back through proj/attention/qkv/GroupNorm.
    Parameter gradients accumulate across the (sequential) TPU grid into
    shared output blocks."""
    TB, L, C = x_ref.shape
    i = pl.program_id(0)
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    amat = amat_ref[:]

    # ---- recompute forward -------------------------------------------------
    s1 = jnp.sum(xf, axis=1)
    s2 = jnp.sum(xf * xf, axis=1)
    mu = jnp.dot(s1, amat, preferred_element_type=jnp.float32)
    ex2 = jnp.dot(s2, amat, preferred_element_type=jnp.float32)
    var = ex2 - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu[:, None, :]) * inv[:, None, :]
    gamma = gns_ref[:].astype(jnp.float32)
    beta = gnb_ref[:].astype(jnp.float32)
    h = (xhat * gamma + beta).astype(x.dtype)

    def wb(w_ref):
        return jnp.broadcast_to(w_ref[:][None], (TB, C, C)).astype(x.dtype)

    q = (_bdot(h, wb(wq_ref), (2, 1), acc_dtype).astype(x.dtype)
         + bq_ref[:].astype(x.dtype))
    k = (_bdot(h, wb(wk_ref), (2, 1), acc_dtype).astype(x.dtype)
         + bk_ref[:].astype(x.dtype))
    v = (_bdot(h, wb(wv_ref), (2, 1), acc_dtype).astype(x.dtype)
         + bv_ref[:].astype(x.dtype))
    c_scale = float(C) ** -0.5
    s = _bdot(q, k, (2, 2)) * c_scale                       # (TB, L, L) f32
    mmax = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - mmax)
    p = p / jnp.sum(p, axis=-1, keepdims=True)              # f32
    pv = p.astype(x.dtype)
    o = _bdot(pv, v, (2, 1), acc_dtype).astype(x.dtype)     # (TB, L, C)

    # ---- backward ----------------------------------------------------------
    g = g_ref[:].astype(x.dtype) * rescale                  # d(out)->d(x + y)
    # proj: y = o @ Wp + bp
    dwp = jnp.sum(_bdot(o, g, (1, 1)), axis=0)              # (C, C) f32
    dbp = jnp.sum(g.astype(jnp.float32), axis=(0, 1))[None, :]
    do = _bdot(g, wb(wp_ref), (2, 2), acc_dtype).astype(x.dtype)
    # attention: o = p v
    dv = _bdot(p.astype(x.dtype), do, (1, 1), acc_dtype).astype(x.dtype)
    dp = _bdot(do, v, (2, 2))                               # (TB, L, L) f32
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = (ds * c_scale).astype(x.dtype)
    dq = _bdot(ds, k, (2, 1), acc_dtype).astype(x.dtype)
    dk = _bdot(ds, q, (1, 1), acc_dtype).astype(x.dtype)
    # qkv NINs: q = h @ Wq + bq ...
    dwq = jnp.sum(_bdot(h, dq, (1, 1)), axis=0)
    dbq = jnp.sum(dq.astype(jnp.float32), axis=(0, 1))[None, :]
    dwk = jnp.sum(_bdot(h, dk, (1, 1)), axis=0)
    dbk = jnp.sum(dk.astype(jnp.float32), axis=(0, 1))[None, :]
    dwv = jnp.sum(_bdot(h, dv, (1, 1)), axis=0)
    dbv = jnp.sum(dv.astype(jnp.float32), axis=(0, 1))[None, :]
    dh = (_bdot(dq, wb(wq_ref), (2, 2), acc_dtype)
          + _bdot(dk, wb(wk_ref), (2, 2), acc_dtype)
          + _bdot(dv, wb(wv_ref), (2, 2), acc_dtype)).astype(jnp.float32)
    # GroupNorm backward
    dgamma = jnp.sum(dh * xhat, axis=(0, 1))[None, :]
    dbeta = jnp.sum(dh, axis=(0, 1))[None, :]
    dxhat = dh * gamma
    m1 = jnp.dot(jnp.sum(dxhat, axis=1), amat,
                 preferred_element_type=jnp.float32)        # mean_g(dxhat)
    m2 = jnp.dot(jnp.sum(dxhat * xhat, axis=1), amat,
                 preferred_element_type=jnp.float32)        # mean_g(dxhat*xhat)
    dxf = inv[:, None, :] * (dxhat - m1[:, None, :] - xhat * m2[:, None, :])
    dx = dxf + g_ref[:].astype(jnp.float32) * rescale       # residual branch

    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        for ref in (dgns_ref, dgnb_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
                    dwv_ref, dbv_ref, dwp_ref, dbp_ref):
            ref[:] = jnp.zeros_like(ref)

    dgns_ref[:] += dgamma
    dgnb_ref[:] += dbeta
    dwq_ref[:] += dwq
    dbq_ref[:] += dbq
    dwk_ref[:] += dwk
    dbk_ref[:] += dbk
    dwv_ref[:] += dwv
    dbv_ref[:] += dbv
    dwp_ref[:] += dwp
    dbp_ref[:] += dbp


def _fused_call(x, amat, gns, gnb, wq, bq, wk, bk, wv, bv, wp, bp, *,
                eps, rescale, acc, tb, interpret):
    B, L, C = x.shape
    grid = (B // tb,)
    xspec = pl.BlockSpec((tb, L, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    pspec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fused_block_kernel, eps=eps, rescale=rescale,
                          acc_dtype=acc),
        out_shape=jax.ShapeDtypeStruct((B, L, C), x.dtype),
        grid=grid,
        in_specs=[xspec, pspec((C, C)), pspec((1, C)), pspec((1, C)),
                  pspec((C, C)), pspec((1, C)), pspec((C, C)), pspec((1, C)),
                  pspec((C, C)), pspec((1, C)), pspec((C, C)), pspec((1, C))],
        out_specs=xspec,
        interpret=interpret,
    )(x, amat, gns, gnb, wq, bq, wk, bk, wv, bv, wp, bp)


def _fused_bwd_call(x, g, amat, gns, gnb, wq, bq, wk, bk, wv, bv, wp, bp, *,
                    eps, rescale, acc, tb, interpret):
    B, L, C = x.shape
    grid = (B // tb,)
    xspec = pl.BlockSpec((tb, L, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    pspec = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    f32 = jnp.float32
    out_shapes = (
        jax.ShapeDtypeStruct((B, L, C), f32),     # dx
        jax.ShapeDtypeStruct((1, C), f32),        # dgn_scale
        jax.ShapeDtypeStruct((1, C), f32),        # dgn_bias
        jax.ShapeDtypeStruct((C, C), f32),        # dWq
        jax.ShapeDtypeStruct((1, C), f32),        # dbq
        jax.ShapeDtypeStruct((C, C), f32),        # dWk
        jax.ShapeDtypeStruct((1, C), f32),        # dbk
        jax.ShapeDtypeStruct((C, C), f32),        # dWv
        jax.ShapeDtypeStruct((1, C), f32),        # dbv
        jax.ShapeDtypeStruct((C, C), f32),        # dWp
        jax.ShapeDtypeStruct((1, C), f32),        # dbp
    )
    out_specs = (xspec, pspec((1, C)), pspec((1, C)), pspec((C, C)),
                 pspec((1, C)), pspec((C, C)), pspec((1, C)), pspec((C, C)),
                 pspec((1, C)), pspec((C, C)), pspec((1, C)))
    return pl.pallas_call(
        functools.partial(_fused_block_bwd_kernel, eps=eps, rescale=rescale,
                          acc_dtype=acc),
        out_shape=out_shapes,
        grid=grid,
        in_specs=[xspec, xspec, pspec((C, C)), pspec((1, C)), pspec((1, C)),
                  pspec((C, C)), pspec((1, C)), pspec((C, C)), pspec((1, C)),
                  pspec((C, C)), pspec((1, C)), pspec((C, C)), pspec((1, C))],
        out_specs=out_specs,
        interpret=interpret,
    )(x, g, amat, gns, gnb, wq, bq, wk, bk, wv, bv, wp, bp)


@functools.lru_cache(maxsize=None)
def _make_fused(groups, skip_rescale, softmax_f32, block_b, interpret):
    import math

    rescale = 1.0 / math.sqrt(2.0) if skip_rescale else 1.0

    @jax.custom_vjp
    def f(x, amat, gns, gnb, wq, bq, wk, bk, wv, bv, wp, bp):
        acc = jnp.float32 if softmax_f32 else x.dtype
        return _fused_call(x, amat, gns, gnb, wq, bq, wk, bk, wv, bv, wp, bp,
                           eps=1e-6, rescale=rescale, acc=acc,
                           tb=min(block_b, x.shape[0]), interpret=interpret)

    def fwd(x, amat, gns, gnb, wq, bq, wk, bk, wv, bv, wp, bp):
        out = f(x, amat, gns, gnb, wq, bq, wk, bk, wv, bv, wp, bp)
        return out, (x, amat, gns, gnb, wq, bq, wk, bk, wv, bv, wp, bp)

    def bwd(res, g):
        x, amat, gns, gnb, wq, bq, wk, bk, wv, bv, wp, bp = res
        acc = jnp.float32 if softmax_f32 else x.dtype
        # backward tiles are heavier (p, dp, ds all live): halve the tile,
        # quarter it for f32 activations (VMEM budget)
        div = 2 if x.dtype == jnp.bfloat16 else 4
        tb = min(max(block_b // div, 8), x.shape[0])
        grads = _fused_bwd_call(x, g.astype(x.dtype), amat, gns, gnb, wq, bq,
                                wk, bk, wv, bv, wp, bp, eps=1e-6,
                                rescale=rescale, acc=acc, tb=tb,
                                interpret=interpret)
        (dx, dgns, dgnb, dwq, dbq, dwk, dbk, dwv, dbv, dwp, dbp) = grads
        return (dx.astype(x.dtype), None, dgns.reshape(gns.shape),
                dgnb.reshape(gnb.shape), dwq, dbq.reshape(bq.shape),
                dwk, dbk.reshape(bk.shape), dwv, dbv.reshape(bv.shape),
                dwp, dbp.reshape(bp.shape))

    f.defvjp(fwd, bwd)
    return f


def fused_attn_block(x, gn_scale, gn_bias, wq, bq, wk, bk, wv, bv, wp, bp, *,
                     groups: int, skip_rescale: bool = True,
                     softmax_f32: bool = True, block_b: int = 64,
                     interpret: bool | None = None):
    """Fused NCSN++ attention block: GroupNorm -> q,k,v NIN -> 81-token
    softmax attention -> proj NIN -> residual (+/sqrt2), one HBM read and
    one write per activation.  Differentiable: the backward pass is a
    second VMEM-resident kernel (recompute + chain rule, parameter grads
    accumulated across the sequential grid)."""
    import numpy as np

    if interpret is None:  # CPU (tests) has no Mosaic: fall back to interpreter
        interpret = jax.default_backend() == "cpu"
    B, H, W, C = x.shape
    L = H * W
    xt = x.reshape(B, L, C)
    cg = C // groups
    g_id = np.arange(C) // cg
    amat = jnp.asarray((g_id[:, None] == g_id[None, :]) / (L * cg), jnp.float32)

    tb = min(block_b, B)
    pad = (-B) % tb
    if pad:
        xt = jnp.concatenate([xt, jnp.zeros((pad, L, C), xt.dtype)], 0)

    dt = xt.dtype
    f = _make_fused(groups, skip_rescale, softmax_f32, block_b, interpret)
    out = f(xt, amat,
            gn_scale.reshape(1, -1).astype(dt), gn_bias.reshape(1, -1).astype(dt),
            wq.astype(dt), bq.reshape(1, -1).astype(dt),
            wk.astype(dt), bk.reshape(1, -1).astype(dt),
            wv.astype(dt), bv.reshape(1, -1).astype(dt),
            wp.astype(dt), bp.reshape(1, -1).astype(dt))
    return out[:B].reshape(B, H, W, C)


@functools.partial(jax.jit, static_argnames=("softmax_f32", "block_b", "interpret"))
def attention_core(q, k, v, softmax_f32: bool = True, block_b: int = 64,
                   interpret: bool = False):
    """softmax(q k^T / sqrt(C)) v with the attention matrix kept in VMEM.

    q, k, v: (B, L, C); returns (B, L, C) in q's dtype.
    """
    B, L, C = q.shape
    scale = float(C) ** -0.5
    acc = jnp.float32 if softmax_f32 else q.dtype
    tb = min(block_b, B)
    # pad B to a tile multiple (static shapes)
    pad = (-B) % tb
    if pad:
        zeros = jnp.zeros((pad, L, C), q.dtype)
        q, k, v = (jnp.concatenate([t, zeros], 0) for t in (q, k, v))
    grid = ((B + pad) // tb,)
    spec = pl.BlockSpec((tb, L, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, acc_dtype=acc),
        out_shape=jax.ShapeDtypeStruct(((B + pad), L, C), q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(q, k, v)
    return out[:B]
