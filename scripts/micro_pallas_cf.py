"""Microbenchmarks for the channels-first Pallas resblock design.

Measures, on the real TPU, the per-call cost of the primitives the v2
fused resblock needs: in-kernel 2D transpose, masked lane-rolls (conv
taps), and wide channels-first dots (C x C) @ (C x B*81).  Uses the
scan-slope method (BENCH_NOTES.md) to cancel tunnel dispatch latency.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 64
TB = 256
L = 81
N = TB * L  # 20736 lanes


def slope(fn, x, K1=50, K2=500):
    def make(K):
        @jax.jit
        def run(x):
            def body(c, _):
                return fn(c), None
            out, _ = jax.lax.scan(body, x, None, length=K)
            return out
        return run
    ts = {}
    for K in (K1, K2):
        r = make(K)
        jnp.sum(r(x)).block_until_ready()
        float(jnp.sum(r(x)))
        t0 = time.time(); float(jnp.sum(r(x))); ts[K] = time.time() - t0
    return (ts[K2] - ts[K1]) / (K2 - K1) * 1e6  # us/iter


def bench_transpose():
    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.transpose(x_ref[:], (1, 0))

    @functools.partial(jax.jit)
    def f(x):
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, N), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        # transpose back outside so the scan carry keeps its shape
        return pl.pallas_call(
            lambda y_ref, o_ref: o_ref.__setitem__(
                slice(None), jnp.transpose(y_ref[:], (1, 0))),
            out_shape=jax.ShapeDtypeStruct((N, C), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(y)

    x = jax.random.normal(jax.random.PRNGKey(0), (N, C), jnp.bfloat16)
    print(f"transpose pair (N,C)<->(C,N): {slope(f, x):7.2f} us")


def bench_roll():
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        # bf16 lane-roll via int32 bitcast (packs sublane pairs; lane
        # structure is untouched, so a lane rotate commutes with the pack)
        xi = pltpu.bitcast(x, jnp.int32)
        acc = jnp.zeros_like(x, jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % L
        for s in (-10, -9, -8, -1, 1, 8, 9, 10):
            r = pltpu.bitcast(pltpu.roll(xi, (-s) % N, 1), jnp.bfloat16)
            q = lane + s
            mask = (q >= 0) & (q < L)
            acc = acc + jnp.where(mask, r, 0).astype(jnp.float32)
        o_ref[:] = acc.astype(x.dtype)

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, N), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jax.random.normal(jax.random.PRNGKey(0), (C, N), jnp.bfloat16)
    print(f"8 masked lane-rolls (C,N):    {slope(f, x):7.2f} us")


def bench_dots(K):
    def kernel(w_ref, x_ref, o_ref):
        acc = jnp.zeros((C, N), jnp.float32)
        taps = 9 if K == C else 3
        for t in range(taps):
            acc = acc + jax.lax.dot(w_ref[t].astype(jnp.bfloat16),
                                    x_ref[:K],
                                    preferred_element_type=jnp.float32)
        o_ref[:] = acc.astype(o_ref.dtype)

    taps = 9 if K == C else 3
    w = jax.random.normal(jax.random.PRNGKey(0), (taps, C, K), jnp.bfloat16)

    @jax.jit
    def f(x):
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C, N), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(w, x)
        if K != C:  # keep scan carry shape
            y = jnp.concatenate([y] * (K // C), axis=0)
        return y

    x = jax.random.normal(jax.random.PRNGKey(1), (max(K, C), N), jnp.bfloat16)

    flops = taps * 2 * C * K * N
    us = slope(f, x)
    print(f"{taps} dots (C={C},K={K})@(K,N={N}): {us:7.2f} us "
          f"-> {flops / (us * 1e-6) / 1e12:.1f} TF/s")


def bench_xla_conv():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, C, C), jnp.bfloat16)

    @jax.jit
    def f(x):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return y.astype(x.dtype)

    x = jax.random.normal(jax.random.PRNGKey(1), (TB, 9, 9, C), jnp.bfloat16)
    us = slope(f, x)
    flops = 2 * 9 * C * C * L * TB
    print(f"XLA conv3x3 NHWC (TB={TB}):   {us:7.2f} us "
          f"-> {flops / (us * 1e-6) / 1e12:.1f} TF/s")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    bench_xla_conv()
    bench_dots(C)      # 9 taps, K=64
    bench_dots(192)    # 3 dy-slices, K=192
    bench_roll()
    bench_transpose()
