"""Stable-manifold boundary targets on the accelerator (JAX, f32).

The reference's SNOPT problem terminates on a
``LibrationOrbitBoundaryCondition(halo, StableLeft, [E, 0*T, L_min],
[E, 1*T, L_max])`` (``cr3bp_...warmstart.py:148-157``): the transfer's
final state must lie on a stable-manifold arc of the L1 halo,
parametrised by the departure phase along the orbit (the sample's
halo-period variable, un-normalised by ``halo.orbit_period`` at
``:165``) and the arc length in time units (the sample's manifold-length
variable).  ``halo.generate_manifold_arc(tau, L, StableLeft)`` (``:210``)
realises a point of that set.

This module computes the same target state as one differentiable jnp
program, vmappable over a batch of (alpha, tau_frac, L) triples:

1. interpolate the halo family table (``rdm_tpu.physics.halo``) at the
   sample's energy offset ``alpha`` -> seed state, period, stable
   eigenvector;
2. propagate the seed ballistically to phase ``tau = tau_frac * T``,
   transporting the stable eigenvector with the exact tangent of the RK4
   flow map (``jax.jvp`` per stage — the variational equations at the
   discretisation's own accuracy);
3. step ``MANIFOLD_EPS`` along the transported (renormalised) direction
   and integrate BACKWARD for ``L`` time units — the manifold arc.

Numerics: backward integration along the stable manifold is
self-stabilising for this use — f32 round-off components *off* the
manifold contract in reverse time, so noise aliases into a slightly
different point ON the arc rather than off it.  Parity with the f64 C++
twin (``cr3bp_native.cpp``) is pinned by ``tests/test_manifold.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .cr3bp import CR3BP_MU
from . import halo as _halo

# Fixed step counts: static shapes so one executable serves every sample.
N_HALO_STEPS = 256     # seed -> phase tau (tau <= T ~ 2.8 TU)
N_MANIFOLD_STEPS = 1024  # backward arc, L in [5, 11] TU

_CONST_CACHE = {}


def _table_jnp():
    """The halo family table as f32 constants (per-process cache).

    Stored as NUMPY arrays on purpose: building jnp arrays here could
    happen inside a caller's jit trace, caching tracers that leak into
    later traces (observed as UnexpectedTracerError on the second
    compile).  numpy constants embed safely into any trace."""
    if "t" not in _CONST_CACHE:
        t = _halo.family_table()
        _CONST_CACHE["t"] = {
            "alphas": np.asarray(t["alphas"], np.float32),
            "states": np.asarray(t["states"], np.float32),
            "periods": np.asarray(t["periods"], np.float32),
            "vstable": np.asarray(t["vstable"], np.float32),
        }
    return _CONST_CACHE["t"]


def interp_seed_jnp(alpha):
    """f32 family interpolation at scalar energy offset ``alpha``:
    (state0[6], period, vstable[6])."""
    t = _table_jnp()
    a = jnp.clip(alpha, t["alphas"][0], t["alphas"][-1])
    state0 = jax.vmap(lambda col: jnp.interp(a, t["alphas"], col),
                      in_axes=1)(t["states"])
    period = jnp.interp(a, t["alphas"], t["periods"])
    vs = jax.vmap(lambda col: jnp.interp(a, t["alphas"], col),
                  in_axes=1)(t["vstable"])
    vs = vs / jnp.linalg.norm(vs)
    return state0, period, vs


def _ode6(s, mu=CR3BP_MU):
    """Ballistic CR3BP vector field on [x y z vx vy vz]."""
    x, y, z, vx, vy, vz = s[0], s[1], s[2], s[3], s[4], s[5]
    r1 = jnp.sqrt((x + mu) ** 2 + y * y + z * z)
    r2 = jnp.sqrt((x - 1 + mu) ** 2 + y * y + z * z)
    r13, r23 = r1 ** 3, r2 ** 3
    ax = x - (1 - mu) * (x + mu) / r13 - mu * (x - 1 + mu) / r23 + 2 * vy
    ay = y - (1 - mu) * y / r13 - mu * y / r23 - 2 * vx
    az = -(1 - mu) * z / r13 - mu * z / r23
    return jnp.stack([vx, vy, vz, ax, ay, az])


def propagate_ballistic(s0, tof, n_steps: int):
    """Fixed-step RK4 ballistic propagation (tof may be negative or a
    traced scalar)."""
    dt = tof / n_steps

    def step(s, _):
        k1 = _ode6(s)
        k2 = _ode6(s + 0.5 * dt * k1)
        k3 = _ode6(s + 0.5 * dt * k2)
        k4 = _ode6(s + dt * k3)
        return s + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

    out, _ = jax.lax.scan(step, s0, None, length=n_steps)
    return out


def propagate_with_tangent(s0, v0, tof, n_steps: int):
    """Propagate a state AND a tangent vector: v evolves with the exact
    derivative of the discrete RK4 flow map (jax.jvp through each step),
    i.e. the variational equations integrated at the same order."""
    dt = tof / n_steps

    def one(s):
        k1 = _ode6(s)
        k2 = _ode6(s + 0.5 * dt * k1)
        k3 = _ode6(s + 0.5 * dt * k2)
        k4 = _ode6(s + dt * k3)
        return s + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

    def step(carry, _):
        s, v = carry
        s_new, v_new = jax.jvp(one, (s,), (v,))
        return (s_new, v_new), None

    (s, v), _ = jax.lax.scan(step, (s0, v0), None, length=n_steps)
    return s, v


def manifold_target_from_data(state0, period, vs, tau_frac, length,
                              n_halo_steps: int = N_HALO_STEPS,
                              n_manifold_steps: int = N_MANIFOLD_STEPS):
    """:func:`manifold_target` from PRE-INTERPOLATED family data
    (seed state / period / stable eigenvector) — the same per-sample
    inputs the C++ oracle receives (``native/__init__.py:_halo_arrays``).
    Used by the mixed-precision solver so its f32 Jacobian twin and df32
    residual share one halo-data source."""
    tau = jnp.clip(tau_frac, 0.0, 1.0) * period
    x_tau, v_tau = propagate_with_tangent(state0, vs, tau, n_halo_steps)
    v_tau = v_tau / (jnp.linalg.norm(v_tau) + 1e-30)
    seed = x_tau + jnp.float32(_halo.MANIFOLD_EPS) * v_tau
    return propagate_ballistic(seed, -length, n_manifold_steps)


def manifold_target(alpha, tau_frac, length,
                    n_halo_steps: int = N_HALO_STEPS,
                    n_manifold_steps: int = N_MANIFOLD_STEPS):
    """End state (6-vector) of the StableLeft manifold arc of the L1 halo
    at energy ``E_L1 + alpha``, departing at orbit phase ``tau_frac`` (the
    sample's normalised halo-period variable) and integrated backward for
    ``length`` time units (the sample's manifold-length variable).

    Differentiable in all three arguments; vmap over a batch."""
    state0, period, vs = interp_seed_jnp(alpha)
    return manifold_target_from_data(state0, period, vs, tau_frac, length,
                                     n_halo_steps, n_manifold_steps)


def manifold_target_batch(alphas, tau_fracs, lengths):
    """vmapped + jitted manifold targets for [N] parameter triples."""
    fn = _CONST_CACHE.get("batch_fn")
    if fn is None:
        fn = jax.jit(jax.vmap(manifold_target))
        _CONST_CACHE["batch_fn"] = fn
    return fn(jnp.asarray(alphas, jnp.float32),
              jnp.asarray(tau_fracs, jnp.float32),
              jnp.asarray(lengths, jnp.float32))
