"""Double-float32 ("df32") arithmetic: ~49-bit-mantissa numbers as
unevaluated sums of two f32 words, built from error-free transformations
(Dekker 1971; Knuth TAOCP 4.2.2; the QD library's double-double kernels).

Why this exists: the TPU's VPU computes IEEE f32 elementwise ops at full
rate but emulated f64 through XLA is ~100x slower (measured on v5e).
The warm-start grading oracle (``physics/solver_tpu.py``) needs f64-class
residual accuracy on high-sensitivity lanes — chaotic CR3BP shooting
amplifies the 6e-8 f32 representation noise by 1e3-1e5, pushing the
achievable residual floor past the 1e-3 feasibility tolerance — while
its Jacobian/linear-algebra work is entirely happy in f32.  df32 gives
the residual path 2^-48-class relative accuracy at a ~10-25x elementwise
flop cost (far below emulated f64), which the mixed-precision LM polish
pays only over short final descents.

Numbers are ``DF(hi, lo)`` pairs with ``|lo| <= ulp(hi)/2`` and value
``hi + lo`` (evaluated in exact arithmetic).  All operations are
elementwise jnp programs: jit/vmap/scan-compatible, shape-polymorphic
via broadcasting.  None of them are meant to be differentiated through —
the solver differentiates its plain-f32 twin instead.

Correctness relies ONLY on IEEE-correctly-rounded f32 +,-,* (TPU VPU and
XLA:CPU both qualify; XLA does not reassociate floats by default).  A
miscompiled error-free transform fails ``tests/test_df32.py`` loudly.

No counterpart in the CUDA/torch reference (its oracle is host-f64
SNOPT); cite: grading semantics served by this precision path are
``cr3bp_earth_mission_simulator_boundary_diffusion_warmstart.py:87-224``.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DF(NamedTuple):
    """hi + lo, |lo| <= ulp(hi)/2.  A pytree of two equal-shape f32s."""
    hi: jax.Array
    lo: jax.Array


# --------------------------------------------------------------------- #
# constructors

def const(x) -> DF:
    """df32 constant from a host f64 scalar/array (exact two-word split)."""
    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return DF(jnp.asarray(hi), jnp.asarray(lo))


def from_f32(x) -> DF:
    x = jnp.asarray(x, jnp.float32)
    return DF(x, jnp.zeros_like(x))


def to_f64(x: DF) -> np.ndarray:
    """Host-side exact readback."""
    return np.asarray(x.hi, np.float64) + np.asarray(x.lo, np.float64)


# --------------------------------------------------------------------- #
# error-free transformations (f32 in, exact two-word out)

def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    """Requires |a| >= |b| (or a == 0)."""
    s = a + b
    err = b - (s - a)
    return s, err


_SPLIT = np.float32(4097.0)  # 2^12 + 1: Dekker split point for 24-bit f32


def _split(a):
    t = _SPLIT * a
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


# --------------------------------------------------------------------- #
# backend self-check
#
# Dekker's transforms need every rounded product used CONSISTENTLY: a
# backend that contracts mul->add/sub chains into FMAs at instruction
# selection substitutes the exact product in some uses and silently
# deletes the compensation terms.  XLA:TPU does not contract (verified:
# 1024-step RK4 tracks host f64 to 3e-13).  XLA:CPU's O2/O3 codegen DOES
# on AVX hosts — the HLO and LLVM IR stay faithful, but the emitted .o
# contains vfnmadd (measured: jit(sqr) lo-word error = hi^2 * 2^-24
# exactly).  No HLO-level guard survives to instruction selection:
# ``optimization_barrier`` is stripped by a CPU pass, a bitcast
# round-trip is simplified away, and xor-of-sign-bit pairs still left
# other contraction sites live.  The working mitigations are
# ``XLA_FLAGS=--xla_cpu_max_isa=SSE4_2`` (no FMA in the ISA; what
# tests/conftest.py sets) or ``--xla_backend_optimization_level=0``.
# ``eft_selfcheck`` lets precision-critical callers fail loudly instead
# of silently grading with a broken number system.

_EFT_OK = None


def eft_selfcheck() -> bool:
    """True iff the jit-compiled error-free transforms are exact on the
    current default backend (cached per process)."""
    global _EFT_OK
    if _EFT_OK is None:
        a = const(np.float64(0.832150584269940356))
        got = float(to_f64(jax.jit(sqr)(a)))
        want = float(to_f64(a)) ** 2
        _EFT_OK = bool(abs(got - want) < 1e-12)
    return _EFT_OK


def require_exact_eft(context: str = "df32"):
    """Raise with remediation if the backend breaks the EFTs."""
    if not eft_selfcheck():
        raise RuntimeError(
            f"{context}: this XLA backend contracts mul+add into FMA at "
            "instruction selection, which breaks double-float32 "
            "arithmetic (see rdm_tpu/ops/df32.py).  On CPU, set "
            "XLA_FLAGS=--xla_cpu_max_isa=SSE4_2 (or "
            "--xla_backend_optimization_level=0) before the first jax "
            "import.  TPU backends are unaffected.")


# --------------------------------------------------------------------- #
# arithmetic

def add(a: DF, b: DF) -> DF:
    """Accurate (Knuth) double-double addition."""
    s1, s2 = _two_sum(a.hi, b.hi)
    t1, t2 = _two_sum(a.lo, b.lo)
    s2 = s2 + t1
    s1, s2 = _quick_two_sum(s1, s2)
    s2 = s2 + t2
    s1, s2 = _quick_two_sum(s1, s2)
    return DF(s1, s2)


def add_f(a: DF, b) -> DF:
    s1, s2 = _two_sum(a.hi, jnp.asarray(b, jnp.float32))
    s2 = s2 + a.lo
    return DF(*_quick_two_sum(s1, s2))


def neg(a: DF) -> DF:
    return DF(-a.hi, -a.lo)


def sub(a: DF, b: DF) -> DF:
    return add(a, neg(b))


def sub_f(a: DF, b) -> DF:
    return add_f(a, -jnp.asarray(b, jnp.float32))


def mul(a: DF, b: DF) -> DF:
    p1, p2 = _two_prod(a.hi, b.hi)
    p2 = p2 + (a.hi * b.lo + a.lo * b.hi)
    return DF(*_quick_two_sum(p1, p2))


def mul_f(a: DF, b) -> DF:
    b = jnp.asarray(b, jnp.float32)
    p1, p2 = _two_prod(a.hi, b)
    p2 = p2 + a.lo * b
    return DF(*_quick_two_sum(p1, p2))


def sqr(a: DF) -> DF:
    p1, p2 = _two_prod(a.hi, a.hi)
    p2 = p2 + 2.0 * (a.hi * a.lo)
    return DF(*_quick_two_sum(p1, p2))


def div(a: DF, b: DF) -> DF:
    """Long division: three f32 quotient words, renormalised."""
    q1 = a.hi / b.hi
    r = sub(a, mul_f(b, q1))
    q2 = r.hi / b.hi
    r = sub(r, mul_f(b, q2))
    q3 = r.hi / b.hi
    s1, s2 = _quick_two_sum(q1, q2)
    return add_f(DF(s1, s2), q3)


def recip(a: DF) -> DF:
    return div(from_f32(jnp.ones_like(a.hi)), a)


def sqrt(a: DF) -> DF:
    """Karp's square root: f32 seed + one df-corrected Newton step.

    a must be > 0 (guard upstream; the CR3BP radii are)."""
    x = jax.lax.rsqrt(jnp.maximum(a.hi, np.float32(1e-30)))  # ~f32-exact 1/sqrt
    ax = a.hi * x                                            # ~sqrt(a)
    # sqrt(a) ~ ax + (a - ax^2) * x / 2, correction computed in df
    err = sub(a, sqr(from_f32(ax)))
    return add_f(DF(err.hi * (x * np.float32(0.5)),
                    err.lo * (x * np.float32(0.5))), ax)


# --------------------------------------------------------------------- #
# trigonometry (needed for thrust-direction vectors from sampled angles)

# sin Taylor coefficients 1/3!..1/15! and cos 1/2!..1/16!, exact df32
# splits of the f64 values (|r| <= pi/4 -> truncation < 5e-17).
_SIN_C = [math.factorial(k) for k in (3, 5, 7, 9, 11, 13, 15)]
_COS_C = [math.factorial(k) for k in (2, 4, 6, 8, 10, 12, 14, 16)]
_PI_2 = math.pi / 2.0


def _poly_sin(r: DF) -> DF:
    """sin(r) for |r| <= pi/4 by df Horner."""
    x2 = sqr(r)
    acc = const(np.float64((-1.0) ** len(_SIN_C) / _SIN_C[-1]))
    acc = DF(jnp.broadcast_to(acc.hi, r.hi.shape),
             jnp.broadcast_to(acc.lo, r.hi.shape))
    for k in range(len(_SIN_C) - 2, -1, -1):
        c = const(np.float64((-1.0) ** (k + 1) / _SIN_C[k]))
        acc = add(mul(acc, x2), DF(jnp.broadcast_to(c.hi, r.hi.shape),
                                   jnp.broadcast_to(c.lo, r.hi.shape)))
    return add(mul(mul(acc, x2), r), r)   # r + r*x2*poly


def _poly_cos(r: DF) -> DF:
    """cos(r) for |r| <= pi/4 by df Horner."""
    x2 = sqr(r)
    acc = const(np.float64((-1.0) ** len(_COS_C) / _COS_C[-1]))
    acc = DF(jnp.broadcast_to(acc.hi, r.hi.shape),
             jnp.broadcast_to(acc.lo, r.hi.shape))
    for k in range(len(_COS_C) - 2, -1, -1):
        c = const(np.float64((-1.0) ** (k + 1) / _COS_C[k]))
        acc = add(mul(acc, x2), DF(jnp.broadcast_to(c.hi, r.hi.shape),
                                   jnp.broadcast_to(c.lo, r.hi.shape)))
    return add_f(mul(acc, x2), np.float32(1.0))


def sincos(a: DF):
    """(sin a, cos a) via quadrant reduction mod pi/2.

    Accurate for |a| up to ~1e3 (the reduction uses a two-word pi/2, so
    absolute reduction error is ~|n| * 2^-49 — the NLP's angle variables
    live in [0, 2pi] plus LM excursions of a few radians)."""
    n = jnp.round(a.hi * np.float32(1.0 / _PI_2))
    r = sub(a, mul_f(const(_PI_2), n))
    k = jnp.asarray(n, jnp.int32) & 3
    s, c = _poly_sin(r), _poly_cos(r)
    # quadrant k: sin(a) = [s, c, -s, -c][k], cos(a) = [c, -s, -c, s][k]
    sin_hi = jnp.select([k == 0, k == 1, k == 2], [s.hi, c.hi, -s.hi], -c.hi)
    sin_lo = jnp.select([k == 0, k == 1, k == 2], [s.lo, c.lo, -s.lo], -c.lo)
    cos_hi = jnp.select([k == 0, k == 1, k == 2], [c.hi, -s.hi, -c.hi], s.hi)
    cos_lo = jnp.select([k == 0, k == 1, k == 2], [c.lo, -s.lo, -c.lo], s.lo)
    return DF(sin_hi, sin_lo), DF(cos_hi, cos_lo)


# --------------------------------------------------------------------- #
# structural helpers (DF is a pytree; these keep call sites readable)

def dmap(f, a: DF) -> DF:
    """Apply the same shape-only op (slice, reshape, transpose...) to
    both words."""
    return DF(f(a.hi), f(a.lo))


def concat(parts, axis=0) -> DF:
    return DF(jnp.concatenate([p.hi for p in parts], axis=axis),
              jnp.concatenate([p.lo for p in parts], axis=axis))


def stack(parts, axis=0) -> DF:
    return DF(jnp.stack([p.hi for p in parts], axis=axis),
              jnp.stack([p.lo for p in parts], axis=axis))


def where(cond, a: DF, b: DF) -> DF:
    return DF(jnp.where(cond, a.hi, b.hi), jnp.where(cond, a.lo, b.lo))


def clip(a: DF, lo, hi) -> DF:
    """Clamp against f32 bounds (bound values are exact in df)."""
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    a = where(a.hi < lo, from_f32(jnp.broadcast_to(lo, a.hi.shape)), a)
    return where(a.hi > hi, from_f32(jnp.broadcast_to(hi, a.hi.shape)), a)


def maximum_f(a: DF, b) -> DF:
    b = jnp.asarray(b, jnp.float32)
    return where(a.hi < b, from_f32(jnp.broadcast_to(b, a.hi.shape)), a)
