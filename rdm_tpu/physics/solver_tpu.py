"""TPU-batched Levenberg-Marquardt warm-start refinement.

The reference grades every diffusion sample by warm-starting a per-sample
SNOPT solve on the host CPU (~17-20 s each, ThreadPoolExecutor fan-out —
``Benchmark/gto_halo_multithreading.py:607-667``).  This framework's native
C++ oracle (``rdm_tpu/native/cr3bp_native.cpp``) replays those semantics at
~50 ms per sample, but it is still a host-CPU serial/thread-pool program.

This module is the fully TPU-native version of the same local solve: the
identical 5-dim L1-arrival residual and LM iteration are expressed as pure
jnp and **vmapped over the whole batch of candidates on the accelerator**.
Design choices that make it a good TPU program rather than a C++ port:

* the Jacobian of the 5-vector residual w.r.t. the 63 free variables is
  computed by **reverse-mode autodiff** (5 cotangent sweeps through the
  RK4 ``lax.scan``) instead of the C++ 63-column forward finite
  differences — ~12x fewer shoots per iteration and exact derivatives,
  which f32 finite differencing could not deliver;
* the C++ sequential "try lambda, x10 on failure (up to 8 times)" damping
  loop becomes a **parallel lambda ladder**: all 8 damped steps are formed
  and trial-shot at once (one extra batched propagation), and the first
  improving rung is selected with a masked argmax — no data-dependent
  control flow inside the hot loop;
* per-sample convergence is handled by ``vmap`` of a ``lax.while_loop``
  (JAX's batching rule masks finished lanes), so a batch retires as soon
  as its slowest *active* sample does, not after a fixed 30 iterations.

Numerics: f32 on TPU.  The LM target tolerance (1e-3 on the residual norm)
sits well inside the grading radius (`_POS_TOL_TIGHT` = 0.08 LU), so f32
integration noise (~1e-5 LU over the ~384-step shoot) does not move the
feasible/infeasible decision; parity with the f64 C++ solver is pinned by
``tests/test_solver_tpu.py``.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import cr3bp as dyn
from .oracle import (_ENERGY_TOL, _POS_TOL_LOOSE, _POS_TOL_TIGHT,
                     _mission_constants)

# Mirrors cr3bp_native.cpp exactly.
NVAR = 63                 # t_shoot, t_c1, t_c2, 20 x (alpha, beta, r)
NRES = 5
_ENERGY_WEIGHT = 2.0
_MASS_FLOOR = 320.0       # kg: dry mass 300 + margin
_MASS_SCALE = 100.0       # kg of deficit per residual unit
_N_LAMBDA = 8             # rungs of the parallel damping ladder
_COAST_STEPS = 32
_SEG_STEPS = 16

_CACHE = {}


def _clamp_vars(theta, n_segments, max_shoot, max_coast, min_shoot=0.0):
    """cr3bp_native.cpp:clamp_vars on the 63-vector (plus the optional
    minimum shooting time the C++ clamp hardcodes to ~0)."""
    t_shoot = jnp.clip(theta[0], max(1e-3, min_shoot), max_shoot)
    coasts = jnp.clip(theta[1:3], 0.0, max_coast)
    ctrl = theta[3:3 + 3 * n_segments].reshape(n_segments, 3)
    ctrl = ctrl.at[:, 2].set(jnp.clip(ctrl[:, 2], 0.0, 1.0))
    return jnp.concatenate([t_shoot[None], coasts, ctrl.reshape(-1)])


def _shoot(theta, spiral_end, thrust, n_segments):
    """Final augmented state of the coast/thrust-arc/coast shoot
    (cr3bp_native.cpp:shoot; same stencil as oracle.evaluate_warmstarts)."""
    t_shoot = jnp.maximum(theta[0], 1e-3)
    t_c1 = jnp.maximum(theta[1], 0.0)
    t_c2 = jnp.maximum(theta[2], 0.0)
    ctrl = theta[3:3 + 3 * n_segments].reshape(n_segments, 3)
    alpha, beta = ctrl[:, 0], ctrl[:, 1]
    throttle = jnp.clip(ctrl[:, 2], 0.0, 1.0)
    u_dir = jnp.stack([jnp.cos(beta) * jnp.cos(alpha),
                       jnp.cos(beta) * jnp.sin(alpha),
                       jnp.sin(beta)], axis=-1)

    s = dyn.propagate(spiral_end, jnp.zeros(3), 0.0, thrust, t_c1,
                      n_steps=_COAST_STEPS)
    seg_dt = t_shoot / n_segments

    def body(c, inp):
        u, thr = inp
        return dyn.propagate(c, u, thr, thrust, seg_dt,
                             n_steps=_SEG_STEPS), None

    s, _ = jax.lax.scan(body, s, (u_dir, throttle))
    s = dyn.propagate(s, jnp.zeros(3), 0.0, thrust, t_c2,
                      n_steps=_COAST_STEPS)
    return s


def _residual(theta, e_target, spiral_end, l1x, thrust, n_segments):
    """5-vector arrival residual (cr3bp_native.cpp:residual): L1 position
    offset (3), weighted CR3BP-energy offset, fuel-budget hinge."""
    s = _shoot(theta, spiral_end, thrust, n_segments)
    r = jnp.stack([
        s[0] - l1x, s[1], s[2],
        _ENERGY_WEIGHT * (dyn.jacobi_energy(s[:6]) - e_target),
        jnp.maximum(_MASS_FLOOR - s[6], 0.0) / _MASS_SCALE,
    ])
    finite = jnp.all(jnp.isfinite(s))
    r = jnp.where(finite, r, jnp.full((NRES,), 1e6, r.dtype))
    return r, (s, finite)


def _refine_one(theta0, e_target, spiral_end, l1x, thrust, n_segments,
                max_iters, tol, max_shoot, max_coast, min_shoot=0.0):
    """LM refinement of one sample; vmapped by the caller."""
    res = lambda th: _residual(th, e_target, spiral_end, l1x, thrust,
                               n_segments)[0]

    theta0 = _clamp_vars(theta0, n_segments, max_shoot, max_coast, min_shoot)
    r0 = res(theta0)
    cost0 = jnp.linalg.norm(r0)

    def cond(carry):
        theta, r, cost, lam, it, stuck = carry
        return (cost > tol) & ~stuck & (it < max_iters)

    def body(carry):
        theta, r, cost, lam, it, _ = carry
        J = jax.jacrev(res)(theta)                      # (NRES, NVAR)
        JJt = J @ J.T                                   # (NRES, NRES)

        # Parallel damping ladder: the C++ attempt loop tries lam, 10*lam,
        # ... accepting the first improving step; form all rungs at once.
        lambdas = lam * (10.0 ** jnp.arange(_N_LAMBDA, dtype=theta.dtype))
        A = JJt[None] + lambdas[:, None, None] * jnp.eye(NRES, dtype=theta.dtype)
        a = jnp.linalg.solve(A, jnp.broadcast_to(-r, (_N_LAMBDA, NRES))[..., None])
        d = (a[..., 0] @ J)                             # (_N_LAMBDA, NVAR)
        trials = jax.vmap(
            lambda dd: _clamp_vars(theta + dd, n_segments, max_shoot,
                                   max_coast, min_shoot))(d)
        r_t = jax.vmap(res)(trials)                     # (_N_LAMBDA, NRES)
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
        return (theta_n, r_n, cost_n, lam_n, it + 1, ~any_improve)

    init = (theta0, r0, cost0, jnp.asarray(1e-3, theta0.dtype),
            jnp.asarray(0, jnp.int32), jnp.asarray(False))
    theta, r, cost, lam, it, _ = jax.lax.while_loop(cond, body, init)

    s_final, finite = _residual(theta, e_target, spiral_end, l1x, thrust,
                                n_segments)[1]
    pos_err = jnp.where(finite, jnp.linalg.norm(s_final[:3] -
                                                jnp.array([l1x, 0.0, 0.0])), 1e6)
    energy_err = jnp.where(
        finite, jnp.abs(dyn.jacobi_energy(s_final[:6]) - e_target), 1e6)
    final_mass = jnp.where(finite, s_final[6], -1.0)
    return theta, pos_err, energy_err, final_mass, it


def _build(thrust, n_segments, start_bdry, max_iters, tol, max_shoot,
           max_coast, n_devices, min_shoot):
    spiral_end, l1x, e_l1 = _mission_constants(start_bdry)
    spiral_end = jnp.asarray(spiral_end, jnp.float32)

    def batch(thetas, e_targets):
        return jax.vmap(
            lambda th, et: _refine_one(th, et, spiral_end, l1x, thrust,
                                       n_segments, max_iters, tol,
                                       max_shoot, max_coast,
                                       min_shoot))(thetas, e_targets)

    if n_devices > 1:
        # The solve is embarrassingly parallel over samples: shard the
        # batch axis over a 1-D mesh and let the SPMD partitioner split the
        # vmapped program — datagen/validation scales over a pod exactly
        # like the training step (parallel/mesh.py).
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
                          min_shoot: float = 0.0):
    """Refine + grade [N, 66] warm starts entirely on the accelerator.

    Drop-in twin of :func:`rdm_tpu.physics.oracle.evaluate_warmstarts_native`
    (same result dict), with the whole batch solved as ONE vmapped XLA
    program instead of a host thread pool.  Batches larger than
    ``batch_tile`` run in fixed-shape tiles (the last tile is padded) so
    arbitrary N reuses one compiled executable and bounded memory.

    ``n_devices`` > 1 shards each tile over that many devices of the
    default backend (0 = all of them, 1 = single-device default); the
    vmapped solve is embarrassingly parallel, so multi-chip scaling is a
    batch-axis sharding annotation.
    """
    if n_devices == 0:
        n_devices = jax.local_device_count()
    n_devices = max(1, min(n_devices, jax.local_device_count()))
    if batch_tile % n_devices:
        batch_tile += n_devices - batch_tile % n_devices
    # exact start_bdry: rounding would feed _mission_constants a DIFFERENT
    # boundary value than other callers while sharing their cache slot
    key = (float(thrust), int(n_segments), float(start_bdry),
           int(max_iters), float(tol), float(max_shoot), float(max_coast),
           int(n_devices), float(min_shoot))
    if key not in _CACHE:
        _CACHE[key] = _build(*key)
    fn, e_l1 = _CACHE[key]

    guesses = np.asarray(guesses, np.float32)
    n = len(guesses)
    thetas_np = guesses[:, :NVAR]
    e_np = e_l1 + np.asarray(halo_energies, np.float32)

    if n <= batch_tile and n % n_devices:
        # pad just to the device count so the direct call shards evenly
        pad = n_devices - n % n_devices
        thetas_np = np.concatenate([thetas_np,
                                    np.repeat(thetas_np[-1:], pad, 0)])
        e_np = np.concatenate([e_np, np.repeat(e_np[-1:], pad)])

    if n > batch_tile:
        outs = []
        for lo in range(0, n, batch_tile):
            t = thetas_np[lo:lo + batch_tile]
            e = e_np[lo:lo + batch_tile]
            if len(t) < batch_tile:  # pad to the compiled tile shape
                pad = batch_tile - len(t)
                t = np.concatenate([t, np.repeat(t[-1:], pad, 0)])
                e = np.concatenate([e, np.repeat(e[-1:], pad)])
            outs.append([np.asarray(o)[:min(batch_tile, n - lo)]
                         for o in fn(jnp.asarray(t), jnp.asarray(e))])
        theta, pos_err, energy_err, final_mass, iters = (
            np.concatenate(cols) for cols in zip(*outs))
    else:
        theta, pos_err, energy_err, final_mass, iters = (
            np.asarray(o)[:n] for o in fn(jnp.asarray(thetas_np),
                                          jnp.asarray(e_np)))
    # float64 like the native oracle's result dict (the solve itself is f32)
    refined = guesses.astype(np.float64)
    refined[:, :NVAR] = np.asarray(theta, np.float64)
    pos_err = np.asarray(pos_err, np.float64)
    energy_err = np.asarray(energy_err, np.float64)
    final_mass = np.asarray(final_mass, np.float64)

    sane = (np.isfinite(pos_err) & (pos_err < 1e5)
            & (final_mass > 300.0) & (final_mass < 1000.1))
    tight = sane & (pos_err < _POS_TOL_TIGHT) & (energy_err < _ENERGY_TOL)
    loose = sane & (pos_err < _POS_TOL_LOOSE) & (energy_err < 2 * _ENERGY_TOL)
    inform = np.where(tight, 1, np.where(loose, 3, 13))
    return {"feasible": loose, "optimal": tight, "inform": inform,
            "pos_err": pos_err, "energy_err": energy_err,
            "refined": refined, "iters": np.asarray(iters, np.int64),
            "final_mass": final_mass}
