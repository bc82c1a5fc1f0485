"""CR3BP + low-thrust dynamics in double-float32 (df32) arithmetic.

The mixed-precision grading path (``solver_tpu`` ``precision="df32"``)
re-evaluates the warm-start NLP residual with ~2^-48 effective mantissa
on the TPU's f32 VPU (see ``rdm_tpu/ops/df32.py`` for why): chaotic
CR3BP shooting amplifies f32 representation noise by 1e3-1e5 over a
transfer, which puts the plain-f32 solver's residual floor above the
1e-3 feasibility tolerance on high-sensitivity lanes — the cause of the
f32-vs-f64 grading gap measured in round 2 (BENCH_NOTES "f32 vs f64
grading").

Mirrors the f64 C++ twin (``native/cr3bp_native.cpp``: ``eom``,
``rk4_step``, ``leg``, ``manifold_target``) and the f32 jnp dynamics
(``cr3bp.py``, ``manifold.py``) step-for-step — same RK4, same
discretisation (COAST_STEPS=32, SEG_STEPS=16, 256 halo + 1024 manifold
steps), so the ONLY difference from the C++ grader is 2^-48 vs 2^-52
roundoff.  Every scalar coefficient that parametrises the dynamics
(1/6, mu, thrust/mass-flow coefficients, halo data) enters as an exact
df32 split of its f64 value — an f32-rounded coefficient would
re-inject the very kappa * 6e-8 noise floor this module removes.

Reference parity: the NLP being evaluated is
``cr3bp_earth_mission_simulator_boundary_diffusion_warmstart.py:87-224``
(see ``solver_tpu.py``); the reference's own grader gets f64 from SNOPT
+ pydylan on the host.

Not differentiated by autodiff: the solver builds its Jacobian by
forward-differencing these df32 residuals (solver_tpu._jac_fd_df), the
same scheme as the C++ twin.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import df32
from ..ops.df32 import DF, dmap
from .cr3bp import CR3BP_MU, DU_KM, G0, TU_S

# exact df32 splits of the f64 mission constants
_MU = df32.const(CR3BP_MU)
_ONE_MINUS_MU = df32.const(1.0 - CR3BP_MU)
_MU_MINUS_1 = df32.const(CR3BP_MU - 1.0)
_SIXTH = df32.const(1.0 / 6.0)
_A_COEF = TU_S ** 2 / (DU_KM * 1000.0)        # (T[N]/m[kg]) -> LU/TU^2


def _ix(a: DF, i) -> DF:
    return DF(a.hi[..., i], a.lo[..., i])


def _bcast(a: DF, shape) -> DF:
    return DF(jnp.broadcast_to(a.hi, shape), jnp.broadcast_to(a.lo, shape))


def _grav_terms(x, y, z):
    """Shared CR3BP gravity factors: c1 = (1-mu)/r1^3, c2 = mu/r2^3 and
    the x-offsets (x+mu), (x-1+mu)."""
    xpmu = df32.add(x, _MU)
    xm1mu = df32.add(x, _MU_MINUS_1)
    yz2 = df32.add(df32.sqr(y), df32.sqr(z))
    r1s = df32.add(df32.sqr(xpmu), yz2)
    r2s = df32.add(df32.sqr(xm1mu), yz2)
    r1 = df32.sqrt(r1s)
    r2 = df32.sqrt(r2s)
    c1 = df32.div(_ONE_MINUS_MU, df32.mul(r1, r1s))
    c2 = df32.div(_MU, df32.mul(r2, r2s))
    return c1, c2, xpmu, xm1mu


def ode6_df(s: DF) -> DF:
    """Ballistic vector field on [x y z vx vy vz] (cr3bp.py:_ode6)."""
    x, y, z = _ix(s, 0), _ix(s, 1), _ix(s, 2)
    vx, vy, vz = _ix(s, 3), _ix(s, 4), _ix(s, 5)
    c1, c2, xpmu, xm1mu = _grav_terms(x, y, z)
    ax = df32.add(df32.sub(df32.sub(x, df32.mul(c1, xpmu)),
                           df32.mul(c2, xm1mu)), df32.mul_f(vy, 2.0))
    ay = df32.sub(df32.sub(df32.sub(y, df32.mul(c1, y)), df32.mul(c2, y)),
                  df32.mul_f(vx, 2.0))
    az = df32.neg(df32.add(df32.mul(c1, z), df32.mul(c2, z)))
    return df32.stack([vx, vy, vz, ax, ay, az], axis=-1)


def eom_df(s: DF, u_dir: DF, throttle: DF, thrust_n: float,
           isp_s: float = 1000.0) -> DF:
    """d/dt of [x y z vx vy vz m]: CR3BP + low-thrust (cr3bp.py:eom)."""
    x, y, z = _ix(s, 0), _ix(s, 1), _ix(s, 2)
    vx, vy, vz = _ix(s, 3), _ix(s, 4), _ix(s, 5)
    m = _ix(s, 6)
    c1, c2, xpmu, xm1mu = _grav_terms(x, y, z)
    ax = df32.add(df32.sub(df32.sub(x, df32.mul(c1, xpmu)),
                           df32.mul(c2, xm1mu)), df32.mul_f(vy, 2.0))
    ay = df32.sub(df32.sub(df32.sub(y, df32.mul(c1, y)), df32.mul(c2, y)),
                  df32.mul_f(vx, 2.0))
    az = df32.neg(df32.add(df32.mul(c1, z), df32.mul(c2, z)))

    # thrust acceleration magnitude and mass flow, coefficients exact-f64
    a_coef = df32.const(float(thrust_n) * _A_COEF)
    a_mag = df32.div(df32.mul(throttle, a_coef),
                     df32.maximum_f(m, np.float32(1e-6)))
    mdot_c = df32.const(-float(thrust_n) / (isp_s * G0 * 1000.0) * TU_S)
    mdot = df32.mul(throttle, mdot_c)

    return df32.stack([
        vx, vy, vz,
        df32.add(ax, df32.mul(a_mag, _ix(u_dir, 0))),
        df32.add(ay, df32.mul(a_mag, _ix(u_dir, 1))),
        df32.add(az, df32.mul(a_mag, _ix(u_dir, 2))),
        mdot,
    ], axis=-1)


def _rk4(f, s: DF, dt: DF) -> DF:
    """One RK4 step of a df vector field; dt a df scalar."""
    def sc(d, k):  # s + d * k, d scalar df
        return df32.add(s, df32.mul(_bcast(d, k.hi.shape), k))

    half = df32.mul_f(dt, 0.5)
    k1 = f(s)
    k2 = f(sc(half, k1))
    k3 = f(sc(half, k2))
    k4 = f(sc(dt, k3))
    incr = df32.add(df32.add(k1, df32.mul_f(df32.add(k2, k3), 2.0)), k4)
    dt6 = df32.mul(dt, _SIXTH)
    return df32.add(s, df32.mul(_bcast(dt6, incr.hi.shape), incr))


def leg_df(s0: DF, u_seq: DF, thr_seq: DF, dt_seq: DF,
           thrust_n: float) -> DF:
    """Thrust leg as ONE flat scan over per-step (u[3], throttle, dt)
    df sequences — the df twin of solver_tpu._leg."""
    def step(s, inp):
        u, thr, dt = inp
        return _rk4(lambda ss: eom_df(ss, u, thr, thrust_n), s, dt), None

    out, _ = jax.lax.scan(step, s0, (u_seq, thr_seq, dt_seq))
    return out


def ballistic_df(s0: DF, tof: DF, n_steps: int) -> DF:
    """Fixed-step ballistic RK4 (manifold.py:propagate_ballistic).
    ``n_steps`` must be a power of two so dt = tof/n is an exact df op."""
    assert n_steps & (n_steps - 1) == 0, "n_steps must be a power of two"
    dt = df32.mul_f(tof, np.float32(1.0 / n_steps))

    def step(s, _):
        return _rk4(ode6_df, s, dt), None

    out, _ = jax.lax.scan(step, s0, None, length=n_steps)
    return out


def _ode12_df(sv: DF) -> DF:
    """Ballistic CR3BP + first variational equations on
    [x y z vx vy vz | dx dy dz dvx dvy dvz] — the df twin of the C++
    ``propagate12`` system (cr3bp_native.cpp:164-204): the tangent
    evolves with d(dv)/dt = U(x) dx + C dv where U is the Hessian block
    of the effective potential and C the Coriolis coupling.

    Why analytic variational equations instead of jax.jvp of an f32
    step: the tangent sets the manifold departure direction as a
    FUNCTION of the orbit phase variable; an f32 transport gives the
    residual ~1e-6-scale non-smooth jitter w.r.t. that variable, which
    the FD Jacobian amplifies by 1/h into garbage columns (measured:
    half the solver lanes stall)."""
    s = dmap(lambda v: v[..., :6], sv)
    d = dmap(lambda v: v[..., 6:], sv)
    x, y, z = _ix(s, 0), _ix(s, 1), _ix(s, 2)
    dx, dy, dz = _ix(d, 0), _ix(d, 1), _ix(d, 2)
    dvx, dvy, dvz = _ix(d, 3), _ix(d, 4), _ix(d, 5)

    ds = ode6_df(s)

    # Hessian of the gravity part: for each primary k with mass m_k and
    # offset vector u = (x - x_k, y, z), r = |u|:
    #   dU a = -m_k/r^3 a + 3 m_k (u . a) u / r^5
    xpmu = df32.add(x, _MU)
    xm1mu = df32.add(x, _MU_MINUS_1)
    yz2 = df32.add(df32.sqr(y), df32.sqr(z))

    def grav_var(ux, m_df):
        r2 = df32.add(df32.sqr(ux), yz2)
        r = df32.sqrt(r2)
        ir3 = df32.div(m_df, df32.mul(r, r2))              # m / r^3
        ir5_3 = df32.div(df32.mul_f(m_df, 3.0),
                         df32.mul(df32.mul(r, r2), r2))    # 3 m / r^5
        udot = df32.add(df32.add(df32.mul(ux, dx), df32.mul(y, dy)),
                        df32.mul(z, dz))
        c = df32.mul(ir5_3, udot)
        ax = df32.sub(df32.mul(c, ux), df32.mul(ir3, dx))
        ay = df32.sub(df32.mul(c, y), df32.mul(ir3, dy))
        az = df32.sub(df32.mul(c, z), df32.mul(ir3, dz))
        return ax, ay, az

    g1 = grav_var(xpmu, _ONE_MINUS_MU)
    g2 = grav_var(xm1mu, _MU)
    # centrifugal (+dx, +dy, 0) and Coriolis (+2dvy, -2dvx, 0)
    ddvx = df32.add(df32.add(df32.add(g1[0], g2[0]), dx),
                    df32.mul_f(dvy, 2.0))
    ddvy = df32.sub(df32.add(df32.add(g1[1], g2[1]), dy),
                    df32.mul_f(dvx, 2.0))
    ddvz = df32.add(g1[2], g2[2])
    return df32.concat([ds, df32.stack([dvx, dvy, dvz, ddvx, ddvy, ddvz],
                                       axis=-1)], axis=-1)


def ballistic_with_tangent_df(s0: DF, v0: DF, tof: DF, n_steps: int):
    """df state + df tangent propagation via the augmented 12-dim RK4
    (same stencil as state-only; C++ twin ``propagate12``)."""
    assert n_steps & (n_steps - 1) == 0
    dt = df32.mul_f(tof, np.float32(1.0 / n_steps))
    sv = df32.concat([s0, v0], axis=-1)

    def step(s, _):
        return _rk4(_ode12_df, s, dt), None

    out, _ = jax.lax.scan(step, sv, None, length=n_steps)
    return dmap(lambda v: v[..., :6], out), dmap(lambda v: v[..., 6:], out)


def manifold_target_from_data_df(state0: DF, period: DF, vstable,
                                 tau_frac: DF, length: DF,
                                 n_halo_steps: int = 256,
                                 n_manifold_steps: int = 1024,
                                 manifold_eps: float = 1e-4) -> DF:
    """StableLeft manifold-arc end state from PRE-INTERPOLATED halo
    family data (the C++ oracle's exact inputs — ``native/__init__.py:
    _halo_arrays`` interpolates host-side in f64; here those f64 values
    arrive as df constants), df throughout.

    manifold.py:manifold_target documents the parametrisation; reference
    semantics ``cr3bp_...warmstart.py:148-165,210``."""
    tau = df32.mul(df32.clip(tau_frac, 0.0, 1.0), period)
    x_tau, v_tau = ballistic_with_tangent_df(state0, df32.from_f32(vstable),
                                             tau, n_halo_steps)
    # normalisation in f32 is fine: v_tau is df-smooth in tau, and the
    # rounding enters the seed at manifold_eps * ulp ~ 6e-12
    v32 = v_tau.hi + v_tau.lo
    v_hat = v32 / (jnp.linalg.norm(v32) + np.float32(1e-30))
    seed = df32.add_f(x_tau, np.float32(manifold_eps) * v_hat)
    return ballistic_df(seed, df32.neg(length), n_manifold_steps)
