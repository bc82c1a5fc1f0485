"""df32 (double-float32) arithmetic vs numpy f64 ground truth.

These tests are the canary for the error-free transformations at the
bottom of the mixed-precision oracle (``rdm_tpu/ops/df32.py``): if the
compiler ever reassociates/contracts the two-sum or Dekker-split
patterns, relative errors jump from ~2^-48 to ~2^-24 and every bound
here fails by orders of magnitude.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdm_tpu.ops import df32

# double-float32 unit roundoff is 2^-49 ~ 1.8e-15; allow a few ulps of
# slop for the renormalisation chains
TOL = 2e-14
N = 4096


def _rand(lo, hi, seed, n=N):
    return np.random.RandomState(seed).uniform(lo, hi, n)


def _rel(err, ref):
    return np.max(np.abs(err) / np.maximum(np.abs(ref), 1e-30))


@pytest.mark.parametrize("op,ref", [
    ("add", lambda a, b: a + b),
    ("sub", lambda a, b: a - b),
    ("mul", lambda a, b: a * b),
    ("div", lambda a, b: a / b),
])
def test_binary_ops(op, ref):
    a = _rand(-1e3, 1e3, 1)
    b = _rand(0.1, 1e3, 2) * np.sign(_rand(-1, 1, 3))
    da, db = df32.const(a), df32.const(b)
    out = jax.jit(getattr(df32, op))(da, db)
    got = df32.to_f64(out)
    want = ref(df32.to_f64(da), df32.to_f64(db))  # exact df inputs
    assert _rel(got - want, want) < TOL, op


def test_add_catastrophic_cancellation():
    """(x + big) - big must recover x to df precision RELATIVE TO THE
    LARGE INTERMEDIATE (2^-48 * 1e4 ~ 4e-11 absolute) — f32 would only
    manage ulp(1e4) ~ 1e-3."""
    x = _rand(-1.0, 1.0, 4)
    big = np.float64(1e4)
    d = df32.sub_f(df32.add_f(df32.const(x), np.float32(big)),
                   np.float32(big))
    assert np.max(np.abs(df32.to_f64(d) - x)) < big * 2 ** -46


def test_sqrt():
    a = _rand(1e-6, 1e6, 5)
    da = df32.const(a)
    got = df32.to_f64(jax.jit(df32.sqrt)(da))
    want = np.sqrt(df32.to_f64(da))
    assert _rel(got - want, want) < TOL


def test_sqr_and_recip():
    a = _rand(0.01, 100.0, 6)
    da = df32.const(a)
    assert _rel(df32.to_f64(df32.sqr(da)) - a * a, a * a) < TOL
    assert _rel(df32.to_f64(df32.recip(da)) - 1 / a, 1 / a) < TOL


def test_sincos():
    # the NLP's angle variables: [0, 2pi] plus LM excursions
    a = _rand(-30.0, 30.0, 7)
    da = df32.const(a)
    s, c = jax.jit(df32.sincos)(da)
    a64 = df32.to_f64(da)
    # absolute tolerance: quadrant reduction costs |n|*2^-49 absolute
    # (n up to ~19 at |a|=30 -> ~5e-14), plus Taylor truncation
    assert np.max(np.abs(df32.to_f64(s) - np.sin(a64))) < 3e-13
    assert np.max(np.abs(df32.to_f64(c) - np.cos(a64))) < 3e-13
    # pythagorean identity as an internal-consistency check
    one = df32.add(df32.sqr(s), df32.sqr(c))
    assert np.max(np.abs(df32.to_f64(one) - 1.0)) < 1e-12


def test_eft_selfcheck_passes():
    """The conftest caps the CPU ISA at SSE4.2 so codegen cannot emit
    FMAs; this canary fails if that protection ever stops working (see
    the backend self-check note in df32.py)."""
    assert df32.eft_selfcheck()


def test_const_roundtrip_exact():
    x = np.array([np.pi, 1e-7, 384400.0, -0.0121505856])
    assert np.all(df32.to_f64(df32.const(x)) == x.astype(np.float64)
                  ) or _rel(df32.to_f64(df32.const(x)) - x, x) < 1e-14


def test_structural_helpers():
    a = df32.const(_rand(0, 1, 8, 16).reshape(4, 4))
    sl = df32.dmap(lambda v: v[:2], a)
    assert sl.hi.shape == (2, 4)
    w = df32.where(a.hi > 0.5, a, df32.neg(a))
    assert np.all(df32.to_f64(w) >= -1e-15) or np.all(np.abs(df32.to_f64(w)) <= 1)
    c = df32.clip(a, 0.2, 0.8)
    v = df32.to_f64(c)
    assert v.min() >= 0.2 - 1e-7 and v.max() <= 0.8 + 1e-7


def test_compounding_rk4_style_accumulation():
    """A long dependent chain (the failure mode that motivates df32):
    10k alternating multiply-adds stay ~1e-12 of f64 while plain f32
    drifts ~1e-4 — proves the compensation survives jit end-to-end."""
    x0 = np.float64(0.1)

    def step_df(x, _):
        x = df32.add_f(df32.mul_f(x, np.float32(1.0000001)), np.float32(1e-5))
        return x, None

    def step_32(x, _):
        return x * np.float32(1.0000001) + np.float32(1e-5), None

    n = 10_000
    df_out, _ = jax.lax.scan(jax.jit(step_df), df32.const(x0), None, length=n)
    f32_out, _ = jax.lax.scan(step_32, jnp.float32(x0), None, length=n)
    x = x0
    for _ in range(n):
        x = x * np.float64(np.float32(1.0000001)) + np.float64(np.float32(1e-5))
    df_err = abs(df32.to_f64(df_out) - x)
    f32_err = abs(np.float64(f32_out) - x)
    assert df_err < 1e-10, df_err
    assert df_err < f32_err / 100.0, (df_err, f32_err)
