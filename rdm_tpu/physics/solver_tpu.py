"""TPU-batched Levenberg-Marquardt warm-start solver (manifold-faithful).

The reference grades every diffusion sample by warm-starting a per-sample
SNOPT solve of the GTO->Halo insertion NLP on the host CPU (~17-20 s
each, ThreadPoolExecutor fan-out — ``Benchmark/
gto_halo_multithreading.py:607-667``).  That NLP
(``cr3bp_...warmstart.py:87-224``):

* free variables = the FULL 66-dim warm start: [t_shoot, t_c1, t_c2,
  20 x (alpha, beta, throttle), mass, halo-period-fraction,
  manifold-length];
* start boundary: the fixed GTO-spiral end state (``:148``);
* end boundary: the state must land on the StableLeft stable-manifold
  arc of the L1 halo at E_L1 + cost_alpha, parametrised by the orbit
  phase (``guess[-2]``, un-normalised by the halo period at ``:165``)
  and the arc length in [5, 11] (``guess[-1]``) (``:155-157``);
* the mass variable is the transfer's terminal mass (reported as
  ``results.control[-3]``, ``:248``);
* ``solver_mode`` feasible|optimal (``:124-127``): optimal additionally
  optimises the mass objective; "locally optimal" = inform 1.

This module solves the same local problem as ONE vmapped XLA program on
the accelerator: a 7-dim residual — 6-state mismatch between the forward
shoot and the manifold target, plus the terminal-mass binding — over all
66 variables, refined by Levenberg-Marquardt.  ``solver_mode="optimal"``
runs the fused feasibility+mass-ascent ratchet (:func:`_ratchet_loop`):
the mass objective becomes an analytic 8th residual row chasing a
target that ratchets upward while feasible; collapse of the ratchet step
below :data:`_OPT_GAIN_TOL` certifies a constrained local optimum and
defines ``snopt_inform == 1``.

TPU-native design choices (vs the C++ twin ``cr3bp_native.cpp``):

* the 7 x 66 Jacobian comes from **reverse-mode autodiff** (7 cotangent
  sweeps through the RK4 ``lax.scan`` stack: shoot + halo phase +
  manifold arc) instead of 66-column finite differences;
* the C++ sequential "try lambda, x10 on failure" damping loop becomes a
  **parallel lambda ladder**: all 8 damped steps are trial-shot at once
  and the first improving rung selected by masked argmax — no
  data-dependent control flow in the hot loop;
* per-sample convergence via ``vmap`` of ``lax.while_loop`` (batching
  masks finished lanes).

Numerics: f32.  The manifold back-integration is self-stabilising (f32
noise off the manifold contracts in reverse time), but close lunar
passes at the family's high-energy end still amplify round-off: the f32
target can differ from the f64 one by up to ~3e-2 LU there
(measured), so C++ <-> TPU parity is pinned statistically (feasible
ratios) plus per-sample in the benign regime by
``tests/test_solver_tpu.py``.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import cr3bp as dyn
from .manifold import manifold_target
from .oracle import _mission_constants

# Full-NLP variable count: 3 times + 60 controls + mass + tau + length.
NVAR = 66
NRES = 7
_MASS_SCALE = 100.0       # kg per residual unit: tol 1e-3 ~ 0.1 kg binding
# Default mass-variable box: the reference's min/max_mass_to_sample
# window (408-470 kg) — also the training-data normalisation window, so
# solved masses stay inside the diffusion model's unit hypercube.
_MASS_MIN = 408.0
_MASS_MAX = 470.0
_MASS_DRY = 301.0         # kg, just above dry mass (physical sanity)
_MASS_WET = 752.0         # kg, spiral-end wet mass
_N_LAMBDA = 8             # rungs of the parallel damping ladder
_COAST_STEPS = 32
_SEG_STEPS = 16
_N_SHOOTS_PER_ITER = 15   # 7 cotangent sweeps + 8 ladder trials (reporting)

# Mass-ascent (optimal mode) knobs.
_OPT_BUDGET = 96          # extra LM iterations granted to the ascent phase
_OPT_GAIN_KG = 2.0        # initial mass-target ratchet step
_OPT_GAIN_MAX = 64.0      # kg cap: gain grows 1.5x per success up to this,
#                           so the ascent reaches the physical mass ceiling
#                           within budget and THEN collapses -> certificate
_OPT_GAIN_TOL = 0.25      # kg: ratchet collapse below this certifies inform 1

_CACHE = {}
#: tile shapes already compiled per solver-config cache key — subsequent
#: calls (e.g. MBH hops over the shrinking stuck set) pad to a seen shape
#: instead of compiling a smaller bucket (see the tile-selection comment
#: in refine_warmstarts_tpu._solve_once)
_TILES_SEEN = {}


def _clamp_vars(theta, n_segments, max_shoot, max_coast, min_shoot=0.0,
                min_mani=5.0, max_mani=11.0,
                mass_min=_MASS_MIN, mass_max=_MASS_MAX):
    """cr3bp_native.cpp:clamp_vars on the 66-vector: times, throttles in
    [0,1], mass in the NLP's mass box, phase fraction in [0,1], manifold
    length in the boundary-condition window (the NLP's variable bounds)."""
    t_shoot = jnp.clip(theta[0], max(1e-3, min_shoot), max_shoot)
    coasts = jnp.clip(theta[1:3], 0.0, max_coast)
    ctrl = theta[3:3 + 3 * n_segments].reshape(n_segments, 3)
    ctrl = ctrl.at[:, 2].set(jnp.clip(ctrl[:, 2], 0.0, 1.0))
    mass = jnp.clip(theta[63], mass_min, mass_max)
    tau = jnp.clip(theta[64], 0.0, 1.0)
    mani = jnp.clip(theta[65], min_mani, max_mani)
    return jnp.concatenate([t_shoot[None], coasts, ctrl.reshape(-1),
                            mass[None], tau[None], mani[None]])


def _controls(theta, n_segments):
    ctrl = theta[3:3 + 3 * n_segments].reshape(n_segments, 3)
    alpha, beta = ctrl[:, 0], ctrl[:, 1]
    throttle = jnp.clip(ctrl[:, 2], 0.0, 1.0)
    u_dir = jnp.stack([jnp.cos(beta) * jnp.cos(alpha),
                       jnp.cos(beta) * jnp.sin(alpha),
                       jnp.sin(beta)], axis=-1)
    return u_dir, throttle


def _leg(s0, u_seq, thr_seq, dt_seq, thrust):
    """ONE flat scan over per-step (direction, throttle, dt) sequences.

    A leg built from nested scans (segment scan of 16-step propagate
    scans) compiles ~an order of magnitude slower once jacrev + the
    lambda-ladder vmap + while_loop wrap it; flattening every leg into a
    single scan keeps the autodiff graph small."""
    def step(s, inp):
        u, thr, dt = inp
        return dyn._rk4_step(s, u, thr, thrust, dt, dyn.CR3BP_MU), None

    out, _ = jax.lax.scan(step, s0, (u_seq, thr_seq, dt_seq))
    return out


def _seg_sequences(u_dir, throttle, seg_dt, lo, hi, reverse=False):
    """Per-step sequences for thrust segments [lo, hi) at _SEG_STEPS
    substeps each (statically shaped)."""
    u = jnp.repeat(u_dir[lo:hi], _SEG_STEPS, axis=0)
    thr = jnp.repeat(throttle[lo:hi], _SEG_STEPS, axis=0)
    n = (hi - lo) * _SEG_STEPS
    dt = jnp.full((n,), seg_dt / _SEG_STEPS)
    if reverse:
        u, thr = u[::-1], thr[::-1]
        dt = -dt
    return u, thr, dt


def _shoot_forward(theta, spiral_end, thrust, n_segments, n_fwd):
    """Forward leg: spiral end -> coast t_c1 -> segments [0, n_fwd)."""
    t_shoot = jnp.maximum(theta[0], 1e-3)
    t_c1 = jnp.maximum(theta[1], 0.0)
    u_dir, throttle = _controls(theta, n_segments)
    seg_dt = t_shoot / n_segments

    zc = jnp.zeros((_COAST_STEPS, 3))
    tc = jnp.zeros((_COAST_STEPS,))
    dc = jnp.full((_COAST_STEPS,), t_c1 / _COAST_STEPS)
    us, ts, ds = _seg_sequences(u_dir, throttle, seg_dt, 0, n_fwd)
    return _leg(spiral_end,
                jnp.concatenate([zc, us]), jnp.concatenate([tc, ts]),
                jnp.concatenate([dc, ds]), thrust)


def _shoot_backward(theta, target6, thrust, n_segments, n_fwd):
    """Backward leg: manifold target (mass = the sample's mass variable)
    <- coast t_c2 <- segments [n_fwd, n_segments), integrated in reverse
    time (mass grows backward through burns)."""
    t_shoot = jnp.maximum(theta[0], 1e-3)
    t_c2 = jnp.maximum(theta[2], 0.0)
    u_dir, throttle = _controls(theta, n_segments)
    seg_dt = t_shoot / n_segments
    # physical sanity only — the NLP's mass box is enforced by _clamp_vars
    mass_end = jnp.clip(theta[63], _MASS_DRY, _MASS_WET)

    s0 = jnp.concatenate([target6, mass_end[None]])
    zc = jnp.zeros((_COAST_STEPS, 3))
    tc = jnp.zeros((_COAST_STEPS,))
    dc = jnp.full((_COAST_STEPS,), -t_c2 / _COAST_STEPS)
    us, ts, ds = _seg_sequences(u_dir, throttle, seg_dt, n_fwd, n_segments,
                                reverse=True)
    return _leg(s0,
                jnp.concatenate([zc, us]), jnp.concatenate([tc, ts]),
                jnp.concatenate([dc, ds]), thrust)


def _shoot(theta, spiral_end, thrust, n_segments):
    """Full forward propagation (diagnostics / terminal-mass reporting)."""
    t_shoot = jnp.maximum(theta[0], 1e-3)
    t_c1 = jnp.maximum(theta[1], 0.0)
    t_c2 = jnp.maximum(theta[2], 0.0)
    u_dir, throttle = _controls(theta, n_segments)
    seg_dt = t_shoot / n_segments
    zc = jnp.zeros((_COAST_STEPS, 3))
    tc = jnp.zeros((_COAST_STEPS,))
    us, ts, ds = _seg_sequences(u_dir, throttle, seg_dt, 0, n_segments)
    u = jnp.concatenate([zc, us, zc])
    th = jnp.concatenate([tc, ts, tc])
    dt = jnp.concatenate([jnp.full((_COAST_STEPS,), t_c1 / _COAST_STEPS),
                          ds,
                          jnp.full((_COAST_STEPS,), t_c2 / _COAST_STEPS)])
    return _leg(spiral_end, u, th, dt, thrust)


def _residual(theta, alpha_he, spiral_end, thrust, n_segments,
              min_mani, max_mani):
    """7-vector matching residual, forward-backward shooting.

    The reference evaluates its solution with
    ``transcription_type.ForwardBackwardShooting``
    (``cr3bp_...warmstart.py:192``): the forward arc from the spiral
    boundary and the backward arc from the end boundary must meet at the
    transfer midpoint.  Meeting in the middle halves the horizon over
    which CR3BP sensitivity compounds, which is what makes a local solver
    converge at all on 20-40 TU transfers.

    All 66 variables are consumed: theta[63] is the terminal-mass
    variable seeding the backward leg, theta[64] the halo-phase fraction
    and theta[65] the manifold length parametrising the end boundary
    (cr3bp_...warmstart.py:148-165)."""
    n_fwd = (n_segments + 1) // 2
    tau = jnp.clip(theta[64], 0.0, 1.0)
    length = jnp.clip(theta[65], min_mani, max_mani)
    tgt = manifold_target(alpha_he, tau, length)

    s_f = _shoot_forward(theta, spiral_end, thrust, n_segments, n_fwd)
    s_b = _shoot_backward(theta, tgt, thrust, n_segments, n_fwd)

    r = jnp.concatenate([
        s_f[:6] - s_b[:6],
        ((s_f[6] - s_b[6]) / _MASS_SCALE)[None],
    ])
    finite = (jnp.all(jnp.isfinite(s_f)) & jnp.all(jnp.isfinite(s_b))
              & jnp.all(jnp.isfinite(tgt)))
    r = jnp.where(finite, r, jnp.full((NRES,), 1e6, r.dtype))
    return r, (s_f, s_b, tgt, finite)


def _lm_loop(res_fn, clamp, theta0, max_iters, tol):
    """Core LM iteration: returns (theta, r, cost, iters)."""
    theta0 = clamp(theta0)
    r0 = res_fn(theta0)
    cost0 = jnp.linalg.norm(r0)

    def cond(carry):
        theta, r, cost, lam, it, stuck = carry
        return (cost > tol) & ~stuck & (it < max_iters)

    def body(carry):
        theta, r, cost, lam, it, _ = carry
        J = jax.jacrev(res_fn)(theta)                   # (NRES, NVAR)
        JJt = J @ J.T

        lambdas = lam * (10.0 ** jnp.arange(_N_LAMBDA, dtype=theta.dtype))
        A = JJt[None] + lambdas[:, None, None] * jnp.eye(NRES, dtype=theta.dtype)
        a = jnp.linalg.solve(A, jnp.broadcast_to(-r, (_N_LAMBDA, NRES))[..., None])
        d = (a[..., 0] @ J)                             # (_N_LAMBDA, NVAR)
        trials = jax.vmap(lambda dd: clamp(theta + dd))(d)
        r_t = jax.vmap(res_fn)(trials)
        cost_t = jnp.linalg.norm(r_t, axis=-1)
        cost_t = jnp.where(jnp.isfinite(cost_t), cost_t, jnp.inf)

        improving = cost_t < cost
        any_improve = jnp.any(improving)
        k = jnp.argmax(improving)                       # first improving rung

        theta_n = jnp.where(any_improve, trials[k], theta)
        r_n = jnp.where(any_improve, r_t[k], r)
        cost_n = jnp.where(any_improve, cost_t[k], cost)
        lam_n = jnp.where(any_improve,
                          jnp.maximum(lambdas[k] * 0.3, 1e-12), lam)
        # match the C++ count: a stuck (rejected) final iteration is not
        # counted (refine_one breaks before ++it)
        it_n = it + jnp.where(any_improve, 1, 0).astype(it.dtype)
        return (theta_n, r_n, cost_n, lam_n, it_n, ~any_improve)

    init = (theta0, r0, cost0, jnp.asarray(1e-3, theta0.dtype),
            jnp.asarray(0, jnp.int32), jnp.asarray(False))
    theta, r, cost, lam, it, _ = jax.lax.while_loop(cond, body, init)
    return theta, r, cost, it


def _ratchet_loop(res_fn, clamp, theta0, base_iters, total_iters, tol):
    """Feasibility LM + mass ascent fused into ONE ``lax.while_loop`` —
    the local equivalent of SNOPT's ``solver_mode optimal`` run
    (cr3bp_...warmstart.py:116-127).

    The mass objective enters as an 8th residual row binding the mass
    variable to a ratcheting target: ``r8 = (m_target - theta[63]) /
    _MASS_SCALE``.  Whenever the lane is feasible the target is pushed
    ``gain`` kg above the current mass; when no damped step improves the
    augmented cost, ``gain`` halves and the target re-anchors.  Collapse
    of ``gain`` below :data:`_OPT_GAIN_TOL` means repeated genuine
    attempts to extract more mass failed -> a constrained local optimum
    (the certificate behind ``snopt_inform == 1``).

    Design note (vs the earlier scan-of-inner-LM-loops ascent): the
    mass-target row is ANALYTIC (``-e63/_MASS_SCALE``), so the augmented
    Jacobian costs no extra autodiff sweep, and the whole optimal phase
    shares one while_loop body with feasibility — one jacrev call site
    total.  The previous nested structure (jacrev inside scan inside
    while) traced+compiled in ~430 s; this one lands within ~1.5x of the
    feasibility-only graph.  It also fixes a real defect: the old
    ``|P_null e_mass|`` certificate was ~1.0 unconditionally (mass
    couples to the residual only through the 1/_MASS_SCALE row), so
    inform 1 could never fire.

    A best-feasible-with-max-mass snapshot is carried because an
    augmented-cost step may trade feasibility for mass; the reported
    solution is always the best FEASIBLE point seen.
    """
    theta0 = clamp(theta0)
    r0 = res_fn(theta0)
    c0 = jnp.linalg.norm(r0)
    dt = theta0.dtype
    e63 = jnp.zeros((NVAR,), dt).at[63].set(1.0)
    feas0 = c0 < tol
    m_tgt0 = theta0[63] + jnp.where(feas0, _OPT_GAIN_KG, 0.0)

    def cond(carry):
        (_theta, _r, c7, _m_tgt, gain, _lam, it, _best, _br, _bc7, has_b,
         stuck) = carry
        converged = (c7 < tol) & (gain < _OPT_GAIN_TOL)
        # lanes that never reached feasibility only get the FEASIBILITY
        # budget (base_iters) — otherwise optimal mode's feasible ratio
        # would not be commensurable with feasible mode's
        budget = jnp.where(has_b, total_iters, base_iters)
        return ~stuck & ~converged & (it < budget)

    def body(carry):
        (theta, r, c7, m_tgt, gain, lam, it, best, br, bc7, has_b,
         _) = carry
        J7 = jax.jacrev(res_fn)(theta)
        # The mass-target row stays INACTIVE until the lane first reaches
        # feasibility: an active zero-residual row would pin theta[63]
        # (acting as an extra constraint) and change which guesses the
        # feasibility phase can solve at all — optimal mode must converge
        # at least the same feasible set as feasible mode.
        w_row = jnp.where(has_b, -1.0 / _MASS_SCALE, 0.0)
        J = jnp.concatenate([J7, (w_row * e63)[None]], axis=0)
        r8 = jnp.concatenate(
            [r, (jnp.where(has_b, (m_tgt - theta[63]) / _MASS_SCALE,
                           0.0))[None]])
        c8 = jnp.linalg.norm(r8)
        JJt = J @ J.T

        lambdas = lam * (10.0 ** jnp.arange(_N_LAMBDA, dtype=dt))
        A = JJt[None] + lambdas[:, None, None] * jnp.eye(NRES + 1, dtype=dt)
        a = jnp.linalg.solve(
            A, jnp.broadcast_to(-r8, (_N_LAMBDA, NRES + 1))[..., None])
        d = a[..., 0] @ J
        trials = jax.vmap(lambda dd: clamp(theta + dd))(d)
        r7_t = jax.vmap(res_fn)(trials)
        m_term = jnp.where(has_b,
                           ((m_tgt - trials[:, 63]) / _MASS_SCALE) ** 2, 0.0)
        c8_t = jnp.sqrt(jnp.sum(r7_t ** 2, axis=-1) + m_term)
        c8_t = jnp.where(jnp.isfinite(c8_t), c8_t, jnp.inf)

        improving = c8_t < c8
        any_imp = jnp.any(improving)
        k = jnp.argmax(improving)

        theta_n = jnp.where(any_imp, trials[k], theta)
        r_n = jnp.where(any_imp, r7_t[k], r)
        c7_n = jnp.where(any_imp, jnp.linalg.norm(r7_t[k]), c7)
        lam_n = jnp.where(any_imp,
                          jnp.maximum(lambdas[k] * 0.3, 1e-12), lam)
        feas_n = c7_n < tol

        better = feas_n & (~has_b | (theta_n[63] > best[63]))
        best_n = jnp.where(better, theta_n, best)
        br_n = jnp.where(better, r_n, br)
        bc7_n = jnp.where(better, c7_n, bc7)
        has_b_n = has_b | feas_n

        # ratchet: feasible lanes chase current-mass + gain; infeasible
        # lanes anchor the target at the current mass (pure feasibility).
        # gain grows 1.5x (capped) only when the step actually extracted
        # >= 30% of the targeted gain, else halves — an accepted step
        # that barely moves mass is evidence the ceiling is near, and
        # counting it as success would grind at the iteration budget
        # without ever collapsing into the certificate.
        mass_gained = theta_n[63] - theta[63]
        ratchet_ok = any_imp & (mass_gained > 0.3 * gain)
        gain_n = jnp.where(
            ~has_b, gain,
            jnp.where(ratchet_ok, jnp.minimum(gain * 1.5, _OPT_GAIN_MAX),
                      gain * 0.5))
        m_tgt_n = jnp.where(
            feas_n, theta_n[63] + gain_n, theta_n[63])
        # an infeasible lane the ladder cannot move is done (if it holds a
        # feasible snapshot that is what gets reported); a FEASIBLE
        # no-improve lane instead halves gain and re-anchors, so it keeps
        # making progress toward the gain-collapse certificate
        stuck_n = ~any_imp & ~feas_n
        it_n = it + jnp.where(any_imp, 1, 0).astype(it.dtype)
        return (theta_n, r_n, c7_n, m_tgt_n, gain_n, lam_n, it_n,
                best_n, br_n, bc7_n, has_b_n, stuck_n)

    init = (theta0, r0, c0, m_tgt0, jnp.asarray(_OPT_GAIN_KG, dt),
            jnp.asarray(1e-3, dt), jnp.asarray(0, jnp.int32),
            theta0, r0, c0, feas0, jnp.asarray(False))
    (theta, r, c7, _m_tgt, gain, _lam, it, best, br, bc7, has_b,
     _stuck) = jax.lax.while_loop(cond, body, init)

    theta_f = jnp.where(has_b, best, theta)
    r_f = jnp.where(has_b, br, r)
    c_f = jnp.where(has_b, bc7, c7)
    return theta_f, r_f, c_f, it, gain, has_b


# ===================================================================== #
# mixed-precision (df32) refinement
#
# The plain-f32 solver's residual floor on a lane is kappa * 2^-24 where
# kappa is the transfer's sensitivity (1e3-1e5 across the family): on
# high-kappa lanes that floor sits ABOVE the 1e-3 feasibility tolerance,
# so the f64 C++ grader converges lanes the f32 TPU solver cannot —
# round 2's measured f32-vs-f64 grading gap (0.766 vs 0.988 on the
# flagship samples; BENCH_NOTES "f32 vs f64 grading").
#
# ``precision="df32"`` fixes this ON-DEVICE with mixed-precision
# arithmetic:
#   * the ITERATE, every residual evaluation, and the forward-difference
#     Jacobian run in double-float32 (rdm_tpu/ops/df32.py +
#     physics/dynamics_df.py): ~2^-48 effective mantissa on the f32 VPU,
#     dropping the residual floor to kappa * 2^-48, far below tolerance
#     on every lane in the family;
#   * the damped-normal-equation solves and accept/reject logic stay f32
#     (LM tolerates approximate step algebra);
#   * per-lane halo family data enters as exact two-word splits of the
#     HOST f64 interpolation (halo.interp_seed) — the identical inputs
#     the C++ oracle receives (native/__init__.py:_halo_arrays), so both
#     graders solve the same NLP to ~the same precision.
# Designs that kept an f32 bulk phase or jacrev-of-f32 Jacobians were
# measured to lose lanes (flagship agreement 0.92/0.95 vs the f64
# grader): the f32 residual's noise LANDSCAPE (value jitter of
# kappa * 2^-24 over ulp-sized moves) misdirects both the descent and
# autodiff, which faithfully differentiates the jitter.
# ===================================================================== #

from ..ops import df32 as _df
from ..ops.df32 import DF
from . import dynamics_df as _ddf


def _dfix(a: DF, i) -> DF:
    return DF(a.hi[..., i], a.lo[..., i])


def _dfexp(a: DF) -> DF:  # scalar -> [1] (for concat assembly)
    return _df.dmap(lambda v: v[None], a)


def _clamp_vars_df(theta: DF, n_segments, max_shoot, max_coast,
                   min_shoot=0.0, min_mani=5.0, max_mani=11.0,
                   mass_min=_MASS_MIN, mass_max=_MASS_MAX) -> DF:
    """df twin of :func:`_clamp_vars` (bounds are exact f32 values)."""
    t_shoot = _df.clip(_dfix(theta, 0), max(1e-3, min_shoot), max_shoot)
    coasts = _df.clip(_df.dmap(lambda v: v[1:3], theta), 0.0, max_coast)
    ctrl = _df.dmap(lambda v: v[3:3 + 3 * n_segments].reshape(n_segments, 3),
                    theta)
    thr = _df.clip(DF(ctrl.hi[:, 2], ctrl.lo[:, 2]), 0.0, 1.0)
    ctrl = DF(ctrl.hi.at[:, 2].set(thr.hi), ctrl.lo.at[:, 2].set(thr.lo))
    mass = _df.clip(_dfix(theta, 63), mass_min, mass_max)
    tau = _df.clip(_dfix(theta, 64), 0.0, 1.0)
    mani = _df.clip(_dfix(theta, 65), min_mani, max_mani)
    return _df.concat([_dfexp(t_shoot), coasts,
                       _df.dmap(lambda v: v.reshape(-1), ctrl),
                       _dfexp(mass), _dfexp(tau), _dfexp(mani)])


def _controls_df(theta: DF, n_segments):
    """df twin of :func:`_controls`: df sincos keeps the thrust-direction
    unit vectors consistent with the df iterate — an f32-rounded
    direction would re-inject a kappa * 2^-24 residual floor."""
    ctrl = _df.dmap(lambda v: v[3:3 + 3 * n_segments].reshape(n_segments, 3),
                    theta)
    alpha = DF(ctrl.hi[:, 0], ctrl.lo[:, 0])
    beta = DF(ctrl.hi[:, 1], ctrl.lo[:, 1])
    throttle = _df.clip(DF(ctrl.hi[:, 2], ctrl.lo[:, 2]), 0.0, 1.0)
    sa, ca = _df.sincos(alpha)
    sb, cb = _df.sincos(beta)
    u_dir = _df.stack([_df.mul(cb, ca), _df.mul(cb, sa), sb], axis=-1)
    return u_dir, throttle


def _seg_sequences_df(u_dir: DF, throttle: DF, seg_dt: DF, lo, hi,
                      reverse=False):
    """df twin of :func:`_seg_sequences` (1/_SEG_STEPS is a power of two,
    so the substep dt scaling is exact)."""
    u = _df.dmap(lambda v: jnp.repeat(v[lo:hi], _SEG_STEPS, axis=0), u_dir)
    thr = _df.dmap(lambda v: jnp.repeat(v[lo:hi], _SEG_STEPS, axis=0),
                   throttle)
    n = (hi - lo) * _SEG_STEPS
    dt1 = _df.mul_f(seg_dt, np.float32(1.0 / _SEG_STEPS))
    dt = _df.dmap(lambda v: jnp.broadcast_to(v, (n,)), dt1)
    if reverse:
        u = _df.dmap(lambda v: v[::-1], u)
        thr = _df.dmap(lambda v: v[::-1], thr)
        dt = _df.neg(dt)
    return u, thr, dt


def _coast_sequences_df(t_coast: DF, sign: float):
    zc = _df.from_f32(jnp.zeros((_COAST_STEPS, 3)))
    tc = _df.from_f32(jnp.zeros((_COAST_STEPS,)))
    d1 = _df.mul_f(t_coast, np.float32(sign / _COAST_STEPS))
    dc = _df.dmap(lambda v: jnp.broadcast_to(v, (_COAST_STEPS,)), d1)
    return zc, tc, dc


def _shoot_forward_df(theta: DF, spiral_end: DF, thrust, n_segments, n_fwd):
    t_shoot = _df.maximum_f(_dfix(theta, 0), np.float32(1e-3))
    t_c1 = _df.maximum_f(_dfix(theta, 1), np.float32(0.0))
    u_dir, throttle = _controls_df(theta, n_segments)
    seg_dt = _df.div(t_shoot, _df.const(float(n_segments)))
    zc, tc, dc = _coast_sequences_df(t_c1, 1.0)
    us, ts, ds = _seg_sequences_df(u_dir, throttle, seg_dt, 0, n_fwd)
    return _ddf.leg_df(spiral_end, _df.concat([zc, us]),
                       _df.concat([tc, ts]), _df.concat([dc, ds]), thrust)


def _shoot_backward_df(theta: DF, tgt6: DF, thrust, n_segments, n_fwd):
    t_shoot = _df.maximum_f(_dfix(theta, 0), np.float32(1e-3))
    t_c2 = _df.maximum_f(_dfix(theta, 2), np.float32(0.0))
    u_dir, throttle = _controls_df(theta, n_segments)
    seg_dt = _df.div(t_shoot, _df.const(float(n_segments)))
    mass_end = _df.clip(_dfix(theta, 63), _MASS_DRY, _MASS_WET)
    s0 = _df.concat([tgt6, _dfexp(mass_end)])
    zc, tc, dc = _coast_sequences_df(t_c2, -1.0)
    us, ts, ds = _seg_sequences_df(u_dir, throttle, seg_dt, n_fwd,
                                   n_segments, reverse=True)
    return _ddf.leg_df(s0, _df.concat([zc, us]), _df.concat([tc, ts]),
                       _df.concat([dc, ds]), thrust)


_INV_MASS_SCALE = 1.0 / _MASS_SCALE


def _residual_data32(theta, halo_state0, period, vstable, spiral_end32,
                     thrust, n_segments, min_mani, max_mani):
    """f32 :func:`_residual` from PRE-INTERPOLATED halo data — the
    Jacobian twin of :func:`_residual_df` (shared data source, so the
    f32 derivative matches the df32 residual's geometry)."""
    from .manifold import manifold_target_from_data

    n_fwd = (n_segments + 1) // 2
    tau = jnp.clip(theta[64], 0.0, 1.0)
    length = jnp.clip(theta[65], min_mani, max_mani)
    tgt = manifold_target_from_data(halo_state0, period, vstable,
                                    tau, length)
    s_f = _shoot_forward(theta, spiral_end32, thrust, n_segments, n_fwd)
    s_b = _shoot_backward(theta, tgt, thrust, n_segments, n_fwd)
    r = jnp.concatenate([
        s_f[:6] - s_b[:6],
        ((s_f[6] - s_b[6]) * np.float32(_INV_MASS_SCALE))[None],
    ])
    finite = jnp.all(jnp.isfinite(s_f)) & jnp.all(jnp.isfinite(s_b)) \
        & jnp.all(jnp.isfinite(tgt))
    return jnp.where(finite, r, jnp.full((NRES,), 1e6, r.dtype))


def _target_df(theta: DF, halo_state0: DF, period: DF, vstable,
               min_mani, max_mani) -> DF:
    """Manifold end-boundary target of the df iterate (only variables
    64/65 — phase and arc length — feed it)."""
    tau = _df.clip(_dfix(theta, 64), 0.0, 1.0)
    length = _df.clip(_dfix(theta, 65), min_mani, max_mani)
    return _ddf.manifold_target_from_data_df(halo_state0, period, vstable,
                                             tau, length)


def _residual_with_target_df(theta: DF, tgt: DF, spiral_end: DF, thrust,
                             n_segments) -> DF:
    """df32 forward-backward shooting residual AGAINST A FIXED target —
    the cheap path (no 1280-step manifold propagation).  The FD Jacobian
    uses it for the 63 columns that cannot move the target, exactly like
    the C++ twin (cr3bp_native.cpp:jacobian_fd).

    Returns the residual as a DF 7-vector: the FD Jacobian differences
    two nearby residuals at step h ~ 1e-6, so the residual must carry
    ~2^-48 absolute precision — an f32-rounded return value would put
    |r| * 2^-24 / h ~ O(1) noise on every Jacobian entry (measured: it
    stalls half the lanes).  Feasibility logic reads the f32 view
    ``r.hi + r.lo``."""
    n_fwd = (n_segments + 1) // 2
    s_f = _shoot_forward_df(theta, spiral_end, thrust, n_segments, n_fwd)
    s_b = _shoot_backward_df(theta, tgt, thrust, n_segments, n_fwd)
    d = _df.sub(s_f, s_b)
    r6 = _df.dmap(lambda v: v[:6], d)
    rm = _df.mul(_dfix(d, 6), _df.const(_INV_MASS_SCALE))
    r = _df.concat([r6, _dfexp(rm)])
    finite = (jnp.all(jnp.isfinite(s_f.hi)) & jnp.all(jnp.isfinite(s_b.hi))
              & jnp.all(jnp.isfinite(tgt.hi)))
    return _df.where(finite, r,
                     _df.from_f32(jnp.full((NRES,), 1e6, jnp.float32)))


def _residual_df(theta: DF, halo_state0: DF, period: DF, vstable,
                 spiral_end: DF, thrust, n_segments, min_mani,
                 max_mani) -> DF:
    """Full df32 residual (target recomputed from the iterate)."""
    tgt = _target_df(theta, halo_state0, period, vstable, min_mani,
                     max_mani)
    return _residual_with_target_df(theta, tgt, spiral_end, thrust,
                                    n_segments)


def _r32(r: DF):
    """f32 view of a df residual (for norms/accept logic/grading)."""
    return r.hi + r.lo


# ---- df32 small-matrix algebra ------------------------------------- #
# The LM normal equations square the shooting Jacobian's conditioning:
# kappa(JJt) = kappa(J)^2 reaches 1e8+ on hard lanes, so an f32 solve
# loses every digit exactly where Gauss-Newton's quadratic endgame
# needs accurate steps (measured: the df solver tracked the C++ f64
# solver for ~4 iterations, then plateaued at cost 0.05-0.5 accepting
# micro-steps while the C++ converged quadratically).  The C++ twin
# does this algebra in f64; these helpers do it in df32 — at NRES x
# NVAR sizes the cost is invisible next to the integrations.

def _df_sum(x: DF, axis: int = -1) -> DF:
    """Tree-reduction sum along ``axis`` in df arithmetic."""
    n = x.hi.shape[axis]
    x = _df.dmap(lambda v: jnp.moveaxis(v, axis, -1), x)
    m = 1
    while m < n:
        m *= 2
    if m != n:
        pad = [(0, 0)] * (x.hi.ndim - 1) + [(0, m - n)]
        x = _df.dmap(lambda v: jnp.pad(v, pad), x)
    while m > 1:
        half = m // 2
        x = _df.add(_df.dmap(lambda v: v[..., :half], x),
                    _df.dmap(lambda v: v[..., half:], x))
        m = half
    return _df.dmap(lambda v: v[..., 0], x)


def _df_gram(J: DF) -> DF:
    """J @ J.T for a DF matrix [n, m] -> [n, n]."""
    Ji = _df.dmap(lambda v: v[:, None, :], J)
    Jj = _df.dmap(lambda v: v[None, :, :], J)
    return _df_sum(_df.mul(Ji, Jj), axis=-1)


def _df_vecmat(a: DF, J: DF) -> DF:
    """a [n] times J [n, m] -> [m] (the LM step d = J^T a)."""
    return _df_sum(_df.mul(_df.dmap(lambda v: v[:, None], a), J), axis=0)


def _df_cholesky_solve(A: DF, b: DF, n: int) -> DF:
    """Solve SPD ``A a = b`` (A [n, n] DF, b [n] DF) by unrolled
    Cholesky + triangular solves, all in df arithmetic.  ``n`` is small
    and static (NRES or NRES+1), so the unrolled op count is ~n^3/3."""
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = _dfix(_dfix(A, i), j)
            for k in range(j):
                s = _df.sub(s, _df.mul(L[i][k], L[j][k]))
            if i == j:
                # guard: a non-SPD / degenerate pivot poisons the lane's
                # trial, which the ladder's finite-cost check discards
                L[i][j] = _df.sqrt(_df.maximum_f(s, np.float32(1e-30)))
            else:
                L[i][j] = _df.div(s, L[j][j])
    y = [None] * n
    for i in range(n):
        s = _dfix(b, i)
        for k in range(i):
            s = _df.sub(s, _df.mul(L[i][k], y[k]))
        y[i] = _df.div(s, L[i][i])
    a = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = _df.sub(s, _df.mul(L[k][i], a[k]))
        a[i] = _df.div(s, L[i][i])
    return _df.stack(a, axis=-1)


_FD_STEP = np.float32(1e-6)  # C++ twin: hstep = 1e-6 * (|g_v| + 1)


def _jac_fd_df(theta: DF, r0: DF, res_with_tgt_df, res_full_df, tgt: DF):
    """Forward-difference Jacobian over the df32 residual — the df twin
    of ``cr3bp_native.cpp:jacobian_fd``.

    Why FD here instead of the f32 path's jacrev: on high-sensitivity
    lanes the f32 residual's LANDSCAPE is noise (value jitter of
    kappa * 2^-24 over ulp-sized moves), and autodiff faithfully
    differentiates that jitter; differencing the ~2^-48-accurate df32
    residual at h = 1e-6(|g|+1) — IN df arithmetic, see
    :func:`_residual_with_target_df` — yields entry noise
    ~|r| * 2^-48 / h, clean where jacrev-of-f32 was garbage.  Matching
    the C++, the 63 columns that cannot move the manifold target reuse
    it (leg-only evaluations, no 1280-step manifold propagation)."""
    h = _FD_STEP * (jnp.abs(theta.hi) + 1.0)              # [NVAR]

    def col_legs(v):
        th = _df.add_f(theta, h[v] * (jnp.arange(NVAR) == v))
        d = _df.sub(res_with_tgt_df(th, tgt), r0)
        hv = _df.from_f32(jnp.broadcast_to(h[v], (NRES,)))
        return _df.div(d, hv)

    def col_full(v):
        th = _df.add_f(theta, h[v] * (jnp.arange(NVAR) == v))
        d = _df.sub(res_full_df(th), r0)
        hv = _df.from_f32(jnp.broadcast_to(h[v], (NRES,)))
        return _df.div(d, hv)

    J_legs = jax.vmap(col_legs)(jnp.arange(63))           # DF (63, NRES)
    J_tail = jax.vmap(col_full)(jnp.arange(63, NVAR))     # DF (3, NRES)
    J = _df.concat([J_legs, J_tail], axis=0)              # DF (NVAR, NRES)
    return _df.dmap(lambda v: v.T, J)                     # DF (NRES, NVAR)


def _lm_loop_df(res_fn_df, jac_fn, clamp_df, theta0: DF, max_iters, tol):
    """:func:`_lm_loop` with a df32 iterate, df32 residual evaluations,
    and an FD-over-df32 Jacobian (``jac_fn(theta, r) -> J``); the step
    algebra stays f32 (mixed-precision iterative refinement — see the
    section comment)."""
    theta0 = clamp_df(theta0)
    r0 = res_fn_df(theta0)                       # DF[NRES]
    cost0 = jnp.linalg.norm(_r32(r0))

    def cond(carry):
        _theta, _r, cost, _lam, it, stuck = carry
        return (cost > tol) & ~stuck & (it < max_iters)

    def body(carry):
        theta, r, cost, lam, it, _ = carry
        J = jac_fn(theta, r)                     # DF[NRES, NVAR]
        JJt = _df_gram(J)                        # DF[NRES, NRES]
        lambdas = lam * (10.0 ** jnp.arange(_N_LAMBDA, dtype=jnp.float32))
        neg_r = _df.neg(r)

        def rung(lam_k):
            A = _df.add_f(JJt, lam_k * jnp.eye(NRES, dtype=jnp.float32))
            a = _df_cholesky_solve(A, neg_r, NRES)
            return clamp_df(_df.add(theta, _df_vecmat(a, J)))

        trials = jax.vmap(rung)(lambdas)         # DF[_N_LAMBDA, NVAR]
        r_t = jax.vmap(res_fn_df)(trials)        # DF[_N_LAMBDA, NRES]
        cost_t = jnp.linalg.norm(_r32(r_t), axis=-1)
        cost_t = jnp.where(jnp.isfinite(cost_t), cost_t, jnp.inf)

        improving = cost_t < cost
        any_improve = jnp.any(improving)
        k = jnp.argmax(improving)
        theta_n = _df.where(any_improve, _df.dmap(lambda v: v[k], trials),
                            theta)
        r_n = _df.where(any_improve, _df.dmap(lambda v: v[k], r_t), r)
        cost_n = jnp.where(any_improve, cost_t[k], cost)
        lam_n = jnp.where(any_improve,
                          jnp.maximum(lambdas[k] * 0.3, 1e-12), lam)
        it_n = it + jnp.where(any_improve, 1, 0).astype(it.dtype)
        return (theta_n, r_n, cost_n, lam_n, it_n, ~any_improve)

    init = (theta0, r0, cost0, jnp.asarray(1e-3, jnp.float32),
            jnp.asarray(0, jnp.int32), jnp.asarray(False))
    theta, r, cost, _lam, it, _ = jax.lax.while_loop(cond, body, init)
    return theta, r, cost, it


def _ratchet_loop_df(res_fn_df, jac_fn, clamp_df, theta0: DF,
                     base_iters, total_iters, tol):
    """:func:`_ratchet_loop` with a df32 iterate/residual and FD-df
    Jacobian (f32 step algebra and ratchet bookkeeping — mass lives at
    ~430 kg where f32 spacing is 3e-5 kg, far below the 0.25 kg
    certificate tolerance)."""
    theta0 = clamp_df(theta0)
    r0 = res_fn_df(theta0)                       # DF[NRES]
    c0 = jnp.linalg.norm(_r32(r0))
    e63 = jnp.zeros((NVAR,), jnp.float32).at[63].set(1.0)
    feas0 = c0 < tol
    m_tgt0 = theta0.hi[63] + jnp.where(feas0, _OPT_GAIN_KG, 0.0)

    def cond(carry):
        (_t, _r, c7, _m, gain, _l, it, _b, _br, _bc, has_b, stuck) = carry
        converged = (c7 < tol) & (gain < _OPT_GAIN_TOL)
        budget = jnp.where(has_b, total_iters, base_iters)
        return ~stuck & ~converged & (it < budget)

    def body(carry):
        (theta, r, c7, m_tgt, gain, lam, it, best, br, bc7, has_b,
         _) = carry
        J7 = jac_fn(theta, r)                    # DF[NRES, NVAR]
        w_row = jnp.where(has_b, np.float32(-_INV_MASS_SCALE), 0.0)
        J = _df.concat([J7, _df.from_f32((w_row * e63)[None])], axis=0)
        m_row = _df.mul(_df.add_f(_df.neg(_dfix(theta, 63)), m_tgt),
                        _df.const(_INV_MASS_SCALE))
        m_row = _df.where(has_b, m_row, _df.from_f32(jnp.float32(0.0)))
        r8 = _df.concat([r, _dfexp(m_row)])      # DF[NRES + 1]
        c8 = jnp.linalg.norm(_r32(r8))
        JJt = _df_gram(J)                        # DF[NRES+1, NRES+1]
        lambdas = lam * (10.0 ** jnp.arange(_N_LAMBDA, dtype=jnp.float32))
        neg_r8 = _df.neg(r8)

        def rung(lam_k):
            A = _df.add_f(JJt, lam_k * jnp.eye(NRES + 1, dtype=jnp.float32))
            a = _df_cholesky_solve(A, neg_r8, NRES + 1)
            return clamp_df(_df.add(theta, _df_vecmat(a, J)))

        trials = jax.vmap(rung)(lambdas)         # DF[_N_LAMBDA, NVAR]
        r7_t = jax.vmap(res_fn_df)(trials)       # DF[_N_LAMBDA, NRES]
        r7_t32 = _r32(r7_t)
        m_term = jnp.where(has_b,
                           ((m_tgt - trials.hi[:, 63])
                            * np.float32(_INV_MASS_SCALE)) ** 2, 0.0)
        c8_t = jnp.sqrt(jnp.sum(r7_t32 ** 2, axis=-1) + m_term)
        c8_t = jnp.where(jnp.isfinite(c8_t), c8_t, jnp.inf)

        improving = c8_t < c8
        any_imp = jnp.any(improving)
        k = jnp.argmax(improving)
        theta_n = _df.where(any_imp, _df.dmap(lambda v: v[k], trials), theta)
        r_n = _df.where(any_imp, _df.dmap(lambda v: v[k], r7_t), r)
        c7_n = jnp.where(any_imp, jnp.linalg.norm(r7_t32[k]), c7)
        lam_n = jnp.where(any_imp, jnp.maximum(lambdas[k] * 0.3, 1e-12), lam)
        feas_n = c7_n < tol

        better = feas_n & (~has_b | (theta_n.hi[63] > best.hi[63]))
        best_n = _df.where(better, theta_n, best)
        br_n = _df.where(better, r_n, br)
        bc7_n = jnp.where(better, c7_n, bc7)
        has_b_n = has_b | feas_n

        mass_gained = theta_n.hi[63] - theta.hi[63]
        ratchet_ok = any_imp & (mass_gained > 0.3 * gain)
        gain_n = jnp.where(
            ~has_b, gain,
            jnp.where(ratchet_ok, jnp.minimum(gain * 1.5, _OPT_GAIN_MAX),
                      gain * 0.5))
        m_tgt_n = jnp.where(feas_n, theta_n.hi[63] + gain_n, theta_n.hi[63])
        stuck_n = ~any_imp & ~feas_n
        it_n = it + jnp.where(any_imp, 1, 0).astype(it.dtype)
        return (theta_n, r_n, c7_n, m_tgt_n, gain_n, lam_n, it_n,
                best_n, br_n, bc7_n, has_b_n, stuck_n)

    init = (theta0, r0, c0, m_tgt0, jnp.asarray(_OPT_GAIN_KG, jnp.float32),
            jnp.asarray(1e-3, jnp.float32), jnp.asarray(0, jnp.int32),
            theta0, r0, c0, feas0, jnp.asarray(False))
    (theta, r, c7, _m, gain, _l, it, best, br, bc7, has_b,
     _s) = jax.lax.while_loop(cond, body, init)
    theta_f = _df.where(has_b, best, theta)
    r_f = _df.where(has_b, br, r)
    c_f = jnp.where(has_b, bc7, c7)
    return theta_f, r_f, c_f, it, gain, has_b


def _refine_one_df(theta0_hi, theta0_lo, halo_hi, halo_lo, per_hi, per_lo,
                   vstable, spiral_end_df, spiral_end32, thrust, n_segments,
                   max_iters, tol, max_shoot, max_coast,
                   min_shoot, min_mani, max_mani, mass_min, mass_max,
                   optimal: bool):
    """Mixed-precision refinement of one sample (vmapped): the SAME
    algorithm as the C++ f64 oracle — ``max_iters`` LM iterations (plus
    the mass-ascent ratchet in optimal mode) with a forward-difference
    Jacobian — run in df32 end-to-end.  Earlier designs ran an f32 bulk
    phase first and/or jacrev-of-f32 Jacobians; both measurably lose
    lanes (flagship agreement with the f64 grader 0.92 vs this design —
    the f32 residual's noise landscape misdirects the descent before the
    precise phase can rescue it)."""
    seed_df = DF(halo_hi, halo_lo)
    period_df = DF(per_hi, per_lo)
    res32 = lambda th: _residual_data32(th, halo_hi, per_hi, vstable,
                                        spiral_end32, thrust, n_segments,
                                        min_mani, max_mani)
    clamp_df = lambda th: _clamp_vars_df(th, n_segments, max_shoot,
                                         max_coast, min_shoot, min_mani,
                                         max_mani, mass_min, mass_max)
    res_df = lambda th: _residual_df(th, seed_df, period_df, vstable,
                                     spiral_end_df, thrust, n_segments,
                                     min_mani, max_mani)
    res_tgt_df = lambda th, tgt: _residual_with_target_df(
        th, tgt, spiral_end_df, thrust, n_segments)

    def jac_fn(theta, r):
        tgt = _target_df(theta, seed_df, period_df, vstable,
                         min_mani, max_mani)
        return _jac_fd_df(theta, r, res_tgt_df, res_df, tgt)

    # the warm start enters as an exact two-word split of the caller's
    # f64 value: an f32-cast input would shift the NLP's residual by
    # kappa * 2^-24 (~1e-4 on hard lanes) before the solve even starts,
    # and would quantize the f64 MBH hop points the native twin sees
    theta_df = DF(theta0_hi, theta0_lo)
    if optimal:
        theta_f, r, cost, it, gain_f, has_b = _ratchet_loop_df(
            res_df, jac_fn, clamp_df, theta_df, max_iters,
            max_iters + _OPT_BUDGET, tol)
        opt_gain = jnp.where(has_b, gain_f, jnp.asarray(1e6, jnp.float32))
        lower, upper = _bounds_arrays(n_segments, max_shoot, max_coast,
                                      min_shoot, min_mani, max_mani,
                                      mass_min, mass_max)
        stationarity = jnp.where(
            has_b, _mass_rate(res32, theta_f.hi, lower, upper),
            jnp.asarray(1e6, jnp.float32))
    else:
        theta_f, r, cost, it = _lm_loop_df(res_df, jac_fn, clamp_df,
                                           theta_df, max_iters, tol)
        opt_gain = jnp.asarray(1e6, jnp.float32)
        stationarity = jnp.asarray(1e6, jnp.float32)

    r32 = _r32(r)
    finite = cost < 1e5
    pos_err = jnp.where(finite, jnp.linalg.norm(r32[:3]), 1e6)
    vel_err = jnp.where(finite, jnp.linalg.norm(r32[3:6]), 1e6)
    final_mass = jnp.where(finite,
                           jnp.clip(theta_f.hi[63], mass_min, mass_max),
                           -1.0)
    term = _shoot(theta_f.hi, spiral_end32, thrust, n_segments)
    terminal_mass = jnp.where(jnp.all(jnp.isfinite(term)), term[6], -1.0)
    return (theta_f.hi, theta_f.lo, cost, pos_err, vel_err, final_mass,
            terminal_mass, it, stationarity, opt_gain)


def _build_df(thrust, n_segments, start_bdry, max_iters,
              tol, max_shoot, max_coast, n_devices, min_shoot, min_mani,
              max_mani, mass_min, mass_max, optimal):
    spiral_end64, _l1x, e_l1 = _mission_constants(start_bdry)
    spiral_end_df = _df.const(np.asarray(spiral_end64, np.float64))
    spiral_end32 = jnp.asarray(spiral_end64, jnp.float32)

    def batch(th_hi, th_lo, halo_hi, halo_lo, per_hi, per_lo, vstable):
        return jax.vmap(
            lambda ta, tb, hh, hl, ph, pl, vs: _refine_one_df(
                ta, tb, hh, hl, ph, pl, vs, spiral_end_df, spiral_end32,
                thrust, n_segments, max_iters, tol,
                max_shoot, max_coast, min_shoot, min_mani, max_mani,
                mass_min, mass_max, optimal)
        )(th_hi, th_lo, halo_hi, halo_lo, per_hi, per_lo, vstable)

    if n_devices > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        mesh = Mesh(np.array(jax.devices()[:n_devices]), ("data",))
        sharding = NamedSharding(mesh, P("data"))
        fn = jax.jit(batch, in_shardings=(sharding,) * 7,
                     out_shardings=sharding)
    else:
        fn = jax.jit(batch)
    return fn, e_l1


def _bounds_arrays(n_segments, max_shoot, max_coast, min_shoot,
                   min_mani, max_mani, mass_min=_MASS_MIN,
                   mass_max=_MASS_MAX):
    """(lower, upper) f32[NVAR] box bounds of the NLP variables."""
    lo = np.full(NVAR, -np.inf, np.float32)
    hi = np.full(NVAR, np.inf, np.float32)
    lo[0], hi[0] = max(1e-3, min_shoot), max_shoot
    lo[1:3], hi[1:3] = 0.0, max_coast
    for k in range(n_segments):
        lo[3 + 3 * k + 2], hi[3 + 3 * k + 2] = 0.0, 1.0
    lo[63], hi[63] = mass_min, mass_max
    lo[64], hi[64] = 0.0, 1.0
    lo[65], hi[65] = min_mani, max_mani
    return jnp.asarray(lo), jnp.asarray(hi)


def _mass_rate(res_fn, theta, lower, upper):
    """First-order achievable mass-increase rate at ``theta``: project
    ``e_mass`` onto the constraint null space, zero components that push
    through an active box bound, re-project — the KKT-style stationarity
    DIAGNOSTIC reported alongside the ratchet certificate."""
    e63 = jnp.zeros((NVAR,), theta.dtype).at[63].set(1.0)
    J = jax.jacrev(res_fn)(theta)
    JJt = J @ J.T + 1e-8 * jnp.eye(NRES, dtype=theta.dtype)

    def proj(v):
        return v - J.T @ jnp.linalg.solve(JJt, J @ v)

    d = proj(e63)
    at_lo = theta <= lower + 1e-6
    at_hi = theta >= upper - 1e-6
    d = jnp.where(at_lo & (d < 0), 0.0, d)
    d = jnp.where(at_hi & (d > 0), 0.0, d)
    return jnp.maximum(proj(d)[63], 0.0)


def _refine_one(theta0, alpha_he, spiral_end, thrust, n_segments,
                max_iters, tol, max_shoot, max_coast, min_shoot,
                min_mani, max_mani, mass_min, mass_max, optimal: bool):
    """LM refinement (+ optional mass ascent) of one sample; vmapped."""
    clamp = lambda th: _clamp_vars(th, n_segments, max_shoot, max_coast,
                                   min_shoot, min_mani, max_mani,
                                   mass_min, mass_max)
    res_fn = lambda th: _residual(th, alpha_he, spiral_end, thrust,
                                  n_segments, min_mani, max_mani)[0]

    if optimal:
        theta, r, cost, it, gain_f, has_b = _ratchet_loop(
            res_fn, clamp, theta0, max_iters, max_iters + _OPT_BUDGET, tol)
        opt_gain = jnp.where(has_b, gain_f, jnp.asarray(1e6, cost.dtype))
        lower, upper = _bounds_arrays(n_segments, max_shoot, max_coast,
                                      min_shoot, min_mani, max_mani,
                                      mass_min, mass_max)
        stationarity = jnp.where(has_b, _mass_rate(res_fn, theta, lower,
                                                   upper),
                                 jnp.asarray(1e6, cost.dtype))
    else:
        theta, r, cost, it = _lm_loop(res_fn, clamp, theta0, max_iters, tol)
        opt_gain = jnp.asarray(1e6, cost.dtype)
        stationarity = jnp.asarray(1e6, cost.dtype)

    # r IS the forward/backward midpoint defect — diagnostics come free
    finite = cost < 1e5
    pos_err = jnp.where(finite, jnp.linalg.norm(r[:3]), 1e6)
    vel_err = jnp.where(finite, jnp.linalg.norm(r[3:6]), 1e6)
    # the solved mass variable = the transfer's terminal mass (reference
    # reports results.control[-3], ...warmstart.py:248); also propagate
    # the full forward arc for the physically-integrated terminal mass
    final_mass = jnp.where(finite,
                           jnp.clip(theta[63], mass_min, mass_max), -1.0)
    term = _shoot(theta, spiral_end, thrust, n_segments)
    terminal_mass = jnp.where(jnp.all(jnp.isfinite(term)), term[6], -1.0)
    return (theta, cost, pos_err, vel_err, final_mass, terminal_mass, it,
            stationarity, opt_gain)


def _build(thrust, n_segments, start_bdry, max_iters, tol, max_shoot,
           max_coast, n_devices, min_shoot, min_mani, max_mani,
           mass_min, mass_max, optimal):
    spiral_end, _l1x, e_l1 = _mission_constants(start_bdry)
    spiral_end = jnp.asarray(spiral_end, jnp.float32)

    def batch(thetas, alphas):
        return jax.vmap(
            lambda th, al: _refine_one(th, al, spiral_end, thrust,
                                       n_segments, max_iters, tol,
                                       max_shoot, max_coast, min_shoot,
                                       min_mani, max_mani,
                                       mass_min, mass_max,
                                       optimal))(thetas, alphas)

    if n_devices > 1:
        # Embarrassingly parallel over samples: shard the batch axis over
        # a 1-D mesh; the SPMD partitioner splits the vmapped program so
        # validation/datagen scales over a pod like the training step.
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        mesh = Mesh(np.array(jax.devices()[:n_devices]), ("data",))
        sharding = NamedSharding(mesh, P("data"))
        fn = jax.jit(batch, in_shardings=(sharding, sharding),
                     out_shardings=sharding)
    else:
        fn = jax.jit(batch)
    return fn, e_l1


def refine_warmstarts_tpu(guesses: np.ndarray, halo_energies: np.ndarray,
                          thrust: float = 1.0, n_segments: int = 20,
                          start_bdry: float = 6.48423370092,
                          max_iters: int = 30, tol: float = 1e-3,
                          max_shoot: float = 40.0, max_coast: float = 15.0,
                          batch_tile: int = 4096, n_devices: int = 1,
                          min_shoot: float = 0.0,
                          min_manifold_length: float = 5.0,
                          max_manifold_length: float = 11.0,
                          min_mass: float = _MASS_MIN,
                          max_mass: float = _MASS_MAX,
                          solver_mode: str = "optimal",
                          mbh_rounds: int = 0,
                          mbh_sigma: float = 0.05,
                          mbh_seed: int = 0,
                          precision: str = "f32"):
    """Solve + grade [N, 66] warm starts entirely on the accelerator.

    Drop-in twin of :func:`rdm_tpu.physics.oracle.evaluate_warmstarts_native`
    (same result dict), with the whole batch solved as ONE vmapped XLA
    program instead of a host thread pool.  Batches larger than
    ``batch_tile`` run in fixed-shape tiles (the last tile is padded) so
    arbitrary N reuses one compiled executable and bounded memory.

    ``solver_mode`` mirrors the reference CLI (``...warmstart.py:124-127``):
    ``"optimal"`` runs the projected mass-ascent phase after feasibility
    and certifies ``inform = 1`` only at a stationary point of the mass
    objective; ``"feasible"`` stops at feasibility (``inform = 3``).

    ``precision="df32"`` runs the WHOLE solve in double-float32 with a
    forward-difference Jacobian — the same algorithm, budget, and
    precision class as the f64 C++ oracle, entirely on-device (see the
    section comment above): grading matches the f64 grader's semantics
    on high-sensitivity lanes instead of flooring at f32 roundoff.

    ``n_devices`` > 1 shards each tile over that many devices of the
    default backend (0 = all of them).

    ``mbh_rounds`` > 0 adds the reference's monotonic-basin-hopping
    globalisation (``...warmstart.py:176``; see ``oracle._mbh_loop``).
    """
    if n_devices == 0:
        n_devices = jax.local_device_count()
    n_devices = max(1, min(n_devices, jax.local_device_count()))
    if batch_tile % n_devices:
        batch_tile += n_devices - batch_tile % n_devices
    optimal = str(solver_mode) != "feasible"
    use_df = str(precision) == "df32"
    if use_df:
        _df.require_exact_eft("refine_warmstarts_tpu(precision='df32')")
    # exact start_bdry: rounding would feed _mission_constants a DIFFERENT
    # boundary value than other callers while sharing their cache slot
    if use_df:
        key = ("df32", float(thrust), int(n_segments), float(start_bdry),
               int(max_iters), float(tol),
               float(max_shoot), float(max_coast), int(n_devices),
               float(min_shoot), float(min_manifold_length),
               float(max_manifold_length), float(min_mass),
               float(max_mass), bool(optimal))
        if key not in _CACHE:
            _CACHE[key] = _build_df(*key[1:])
    else:
        key = (float(thrust), int(n_segments), float(start_bdry),
               int(max_iters), float(tol), float(max_shoot),
               float(max_coast), int(n_devices), float(min_shoot),
               float(min_manifold_length), float(max_manifold_length),
               float(min_mass), float(max_mass), bool(optimal))
        if key not in _CACHE:
            _CACHE[key] = _build(*key)
    fn, _e_l1 = _CACHE[key]

    from .oracle import _grade

    def _lane_arrays(thetas_np, energies_in):
        """Per-lane device inputs for one tile: (theta_f32, alpha) for
        f32; exact two-word splits of the f64 warm starts AND of the
        host-f64 halo family data for df32."""
        if not use_df:
            return (np.asarray(thetas_np, np.float32),
                    np.asarray(energies_in, np.float32))
        from . import halo as _halo
        th64 = np.asarray(thetas_np, np.float64)
        th_hi = th64.astype(np.float32)
        sd = _halo.interp_seed(np.asarray(energies_in, np.float64))
        s64 = np.atleast_2d(np.asarray(sd["state0"], np.float64))
        p64 = np.atleast_1d(np.asarray(sd["period"], np.float64))
        vs = np.atleast_2d(np.asarray(sd["vstable"], np.float64))
        s_hi = s64.astype(np.float32)
        p_hi = p64.astype(np.float32)
        return (th_hi, (th64 - th_hi).astype(np.float32),
                s_hi, (s64 - s_hi).astype(np.float32),
                p_hi, (p64 - p_hi).astype(np.float32),
                vs.astype(np.float32))

    def _run_tile(arrs):
        outs = fn(*(jnp.asarray(a) for a in arrs))
        if use_df:
            th_hi, th_lo, *rest = outs
            # the df32 iterate carries ~f64 precision back to the host
            theta = np.asarray(th_hi, np.float64) + np.asarray(th_lo,
                                                               np.float64)
            return [theta] + [np.asarray(o) for o in rest]
        return [np.asarray(o) for o in outs]

    def _solve_once(guesses_in, energies_in):
        # df32 keeps the caller's f64 warm starts exact (split to two
        # words at _lane_arrays); the f32 path quantizes here as before
        g = np.asarray(guesses_in, np.float64 if use_df else np.float32)
        n = len(g)
        thetas_np = g[:, :NVAR]
        e_np = np.asarray(energies_in, np.float64)

        if n <= batch_tile:
            # Prefer a tile shape this solver config has ALREADY compiled:
            # every distinct batch shape costs a full XLA compile of the
            # solver graph (~3-4 min for the df32 program), which dwarfs
            # the device time of solving padded duplicate lanes (a full
            # 1024-lane df32 solve is ~25 s).  MBH hops shrink the batch
            # every round, so without reuse an MBH-8 grading pays
            # log2(batch)-ish compiles — measured ~30 min wall of which
            # ~25 min was compile.  Falls back to power-of-two bucketing
            # (bounding the compile count) for never-seen sizes.
            seen = _TILES_SEEN.setdefault(key, set())
            fits = [t for t in seen if n <= t <= batch_tile]
            if fits:
                target = min(fits)
            else:
                target = max(n_devices, 8)
                while target < n:
                    target *= 2
                target = min(target, batch_tile)
                if target % n_devices:
                    target += n_devices - target % n_devices
                seen.add(target)
            pad = max(target, n) - n
            if pad:
                thetas_np = np.concatenate(
                    [thetas_np, np.repeat(thetas_np[-1:], pad, 0)])
                e_np = np.concatenate([e_np, np.repeat(e_np[-1:], pad)])

        if n > batch_tile:
            _TILES_SEEN.setdefault(key, set()).add(batch_tile)
            outs = []
            for lo in range(0, n, batch_tile):
                t = thetas_np[lo:lo + batch_tile]
                e = e_np[lo:lo + batch_tile]
                if len(t) < batch_tile:  # pad to the compiled tile shape
                    pad = batch_tile - len(t)
                    t = np.concatenate([t, np.repeat(t[-1:], pad, 0)])
                    e = np.concatenate([e, np.repeat(e[-1:], pad)])
                outs.append([o[:min(batch_tile, n - lo)]
                             for o in _run_tile(_lane_arrays(t, e))])
            (theta, cost, pos_err, vel_err, final_mass, terminal_mass,
             iters, stat, opt_gain) = (np.concatenate(cols)
                                       for cols in zip(*outs))
        else:
            (theta, cost, pos_err, vel_err, final_mass, terminal_mass,
             iters, stat, opt_gain) = (o[:n] for o in _run_tile(
                 _lane_arrays(thetas_np, e_np)))
        # float64 like the native oracle's dict (the f32 solve carries
        # f32 precision; the df32 solve genuine two-word precision)
        refined = g.astype(np.float64)
        refined[:, :NVAR] = np.asarray(theta, np.float64)
        out = {"refined": refined,
               "cost": np.asarray(cost, np.float64),
               "pos_err": np.asarray(pos_err, np.float64),
               "vel_err": np.asarray(vel_err, np.float64),
               "final_mass": np.asarray(final_mass, np.float64),
               "terminal_mass": np.asarray(terminal_mass, np.float64),
               "iters": np.asarray(iters, np.int64),
               "stationarity": np.asarray(stat, np.float64),
               "opt_gain": np.asarray(opt_gain, np.float64)}
        # inform 1 = the mass-ascent ratchet CONVERGED (gain collapsed
        # after repeated failed attempts to extract more mass) — a
        # constrained local optimum, the analogue of SNOPT inform 1
        # (...warmstart.py:197)
        return _grade(out, tol, optimal, solver_mode)

    if mbh_rounds > 0:
        from .oracle import _mbh_loop, nlp_box
        lo_b, hi_b = nlp_box(n_segments, max_shoot, max_coast, min_shoot,
                             min_manifold_length, max_manifold_length,
                             min_mass, max_mass)
        return _mbh_loop(_solve_once,
                         np.asarray(guesses, np.float64)[:, :NVAR],
                         np.asarray(halo_energies, np.float64),
                         mbh_rounds, mbh_sigma, mbh_seed, lo_b, hi_b)
    return _solve_once(guesses, halo_energies)
