"""df32 CR3BP dynamics vs the IDENTICAL RK4 scheme in host f64.

Same discretisation on both sides, so the comparison isolates roundoff:
df32 must track f64 to ~1e-10 after hundreds of steps where plain f32
drifts 1e-4-1e-2 (the grading-gap mechanism, BENCH_NOTES "f32 vs f64
grading").
"""
import jax.numpy as jnp
import numpy as np

from rdm_tpu.ops import df32
from rdm_tpu.physics import cr3bp as dyn
from rdm_tpu.physics.dynamics_df import (ballistic_df, eom_df, leg_df,
                                         ode6_df)

MU = np.float64(dyn.CR3BP_MU)


def _ode6_f64(s):
    x, y, z, vx, vy, vz = s
    r1 = np.sqrt((x + MU) ** 2 + y * y + z * z)
    r2 = np.sqrt((x - 1 + MU) ** 2 + y * y + z * z)
    r13, r23 = r1 ** 3, r2 ** 3
    ax = x - (1 - MU) * (x + MU) / r13 - MU * (x - 1 + MU) / r23 + 2 * vy
    ay = y - (1 - MU) * y / r13 - MU * y / r23 - 2 * vx
    az = -(1 - MU) * z / r13 - MU * z / r23
    return np.array([vx, vy, vz, ax, ay, az])


def _rk4_f64(f, s, dt, n):
    for _ in range(n):
        k1 = f(s)
        k2 = f(s + 0.5 * dt * k1)
        k3 = f(s + 0.5 * dt * k2)
        k4 = f(s + dt * k3)
        s = s + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
    return s


# an L1-neighbourhood state: the regime whose sensitivity exposes f32
S0 = np.array([0.82, 0.02, 0.05, 0.01, 0.15, -0.02], np.float64)


def test_ode6_df_matches_f64_pointwise():
    got = df32.to_f64(ode6_df(df32.const(S0)))
    want = _ode6_f64(S0)
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-13)


def test_ballistic_df_tracks_f64():
    tof, n = 4.0, 1024
    want = _rk4_f64(_ode6_f64, S0.copy(), tof / n, n)
    got = df32.to_f64(ballistic_df(df32.const(S0), df32.const(tof), n))
    err_df = np.max(np.abs(got - want))
    # plain f32, same scheme — the baseline the df path exists to beat
    f32_end = np.asarray(
        __import__("rdm_tpu.physics.manifold", fromlist=["propagate_ballistic"]
                   ).propagate_ballistic(jnp.asarray(S0, jnp.float32),
                                         jnp.float32(tof), n), np.float64)
    err_f32 = np.max(np.abs(f32_end - want))
    assert err_df < 1e-9, err_df
    assert err_df < err_f32 / 1e3, (err_df, err_f32)


def test_thrust_eom_df_matches_f64():
    s7 = np.concatenate([S0, [430.0]])
    u = np.array([0.6, -0.64, 0.48], np.float64)
    u = u / np.linalg.norm(u)
    thr, tn, isp = np.float64(0.7), 1.0, 1000.0

    def _eom7_f64(s):
        ds6 = _ode6_f64(s[:6])
        a_mag = thr * tn / max(s[6], 1e-6) * (dyn.TU_S ** 2 / (dyn.DU_KM * 1e3))
        mdot = -thr * tn / (isp * dyn.G0 * 1000.0) * dyn.TU_S
        out = np.concatenate([ds6, [mdot]])
        out[3:6] += a_mag * u
        return out

    got = df32.to_f64(eom_df(df32.const(s7), df32.const(u),
                             df32.const(thr), tn))
    want = _eom7_f64(s7)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_leg_df_tracks_f64():
    """A 160-step burn leg (10 segments x 16 substeps, the solver's
    forward-arc shape) stays within 1e-9 of the f64 twin."""
    s7 = np.concatenate([S0, [430.0]])
    rs = np.random.RandomState(3)
    nseg = 10
    ang = rs.uniform(0, 2 * np.pi, (nseg, 2))
    u_seg = np.stack([np.cos(ang[:, 1]) * np.cos(ang[:, 0]),
                      np.cos(ang[:, 1]) * np.sin(ang[:, 0]),
                      np.sin(ang[:, 1])], -1)
    thr_seg = rs.uniform(0, 1, nseg)
    seg_dt, sub = 0.11, 16

    def _eom7_f64(s, u, thr):
        ds6 = _ode6_f64(s[:6])
        a_mag = thr / max(s[6], 1e-6) * (dyn.TU_S ** 2 / (dyn.DU_KM * 1e3))
        mdot = -thr / (1000.0 * dyn.G0 * 1000.0) * dyn.TU_S
        out = np.concatenate([ds6, [mdot]])
        out[3:6] += a_mag * u
        return out

    want = s7.copy()
    for k in range(nseg):
        want = _rk4_f64(lambda s: _eom7_f64(s, u_seg[k], thr_seg[k]),
                        want, seg_dt / sub, sub)

    u_seq = df32.const(np.repeat(u_seg, sub, axis=0))
    thr_seq = df32.const(np.repeat(thr_seg, sub))
    dt_seq = df32.const(np.full(nseg * sub, seg_dt / sub))
    got = df32.to_f64(leg_df(df32.const(s7), u_seq, thr_seq, dt_seq, 1.0))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)
