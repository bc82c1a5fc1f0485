"""Stable-manifold boundary targets (rdm_tpu/physics/manifold.py) and
their f64 C++ twin (cr3bp_native.cpp:manifold_target).

The reference realises these targets through
``pydylan.periodic_orbit.Halo.generate_manifold_arc(tau, L, StableLeft)``
(``cr3bp_...warmstart.py:148-157,210``); this framework authored the
capability.  Pinned here:

* C++ f64 vs JAX f32 parity of the full target map (halo phase
  propagation with eigenvector transport + eps-step + backward arc);
* the manifold property itself: integrating a target FORWARD for L time
  units must land back near the halo orbit (that is what "stable
  manifold" means);
* differentiability + vmap of the JAX path (the solver jacrevs it).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rdm_tpu import native
from rdm_tpu.physics import halo as halo_lib
from rdm_tpu.physics import manifold


def _cases():
    # (alpha, tau, length, f32-vs-f64 tolerance): round-off amplification
    # grows with energy and arc length (measured 1.8e-4 / 1.3e-2 / 5.4e-3
    # — the solver_tpu.py docstring's ~3e-2 worst-case bound)
    return [
        (0.02, 0.25, 6.0, 1e-3),
        (0.05, 0.6, 8.0, 3e-2),
        (0.09, 0.9, 10.5, 3e-2),
    ]


@pytest.mark.skipif(not native.available(),
                    reason="native oracle not built")
@pytest.mark.parametrize("alpha,tau,length,tol", _cases())
def test_cpp_matches_jax_target(alpha, tau, length, tol):
    """f64 C++ and f32 JAX compute the same arc end state (to the f32
    chaotic-amplification tolerance measured per regime)."""
    sd = halo_lib.interp_seed(alpha)
    out_c = native.manifold_target(sd["state0"], float(sd["period"]),
                                   sd["vstable"], tau, length)
    out_j = np.asarray(manifold.manifold_target(
        jnp.float32(alpha), jnp.float32(tau), jnp.float32(length)))
    assert np.isfinite(out_c).all() and np.isfinite(out_j).all()
    assert np.abs(out_c - out_j).max() < tol, (out_c, out_j)


@pytest.mark.slow
@pytest.mark.parametrize("alpha,tau,length,tol", _cases()[:2])
def test_target_lies_on_stable_manifold(alpha, tau, length, tol):
    """Forward-propagating the target for L TU must approach the halo
    orbit (within the eps-step scale amplified by in-plane drift): the
    defining property of a stable-manifold arc."""
    sd = halo_lib.interp_seed(alpha)
    tgt = np.asarray(manifold.manifold_target(
        jnp.float32(alpha), jnp.float32(tau), jnp.float32(length)),
        np.float64)
    fwd = np.asarray(manifold.propagate_ballistic(
        jnp.asarray(tgt, jnp.float32), jnp.float32(length),
        manifold.N_MANIFOLD_STEPS))
    # distance from the (discretised) halo orbit
    ts = np.linspace(0.0, float(sd["period"]), 256, endpoint=False)
    orbit = []
    s = jnp.asarray(sd["state0"], jnp.float32)
    step = float(sd["period"]) / 256
    for _ in range(256):
        orbit.append(np.asarray(s))
        s = manifold.propagate_ballistic(s, jnp.float32(step), 4)
    orbit = np.stack(orbit)
    d = np.linalg.norm(orbit[:, :3] - np.asarray(fwd)[:3], axis=1).min()
    # departure point was eps=1e-4 off the orbit; the return lands close
    # on the position component (velocity phase may drift)
    assert d < 5e-2, f"forward-propagated target misses the halo by {d}"


@pytest.mark.slow  # vmap+grad through the manifold propagation compiles ~35 s;
# correctness of the same path is covered by the solver/oracle core tests
def test_vmap_and_grad():
    alphas = jnp.asarray([0.02, 0.05], jnp.float32)
    taus = jnp.asarray([0.3, 0.7], jnp.float32)
    lens = jnp.asarray([6.0, 9.0], jnp.float32)
    batch = manifold.manifold_target_batch(alphas, taus, lens)
    assert batch.shape == (2, 6)
    assert np.isfinite(np.asarray(batch)).all()

    g = jax.grad(lambda t: jnp.sum(manifold.manifold_target(
        jnp.float32(0.05), t, jnp.float32(8.0)) ** 2))(jnp.float32(0.4))
    assert np.isfinite(float(g))


def test_interp_seed_consistency_with_host_table():
    """f32 jnp interpolation (manifold._table_jnp) agrees with the f64
    host interpolation (halo.interp_seed) to f32 resolution."""
    for alpha in (0.01, 0.047, 0.09):
        s0, period, vs = manifold.interp_seed_jnp(jnp.float32(alpha))
        sd = halo_lib.interp_seed(alpha)
        assert abs(float(period) - float(sd["period"])) < 1e-4
        np.testing.assert_allclose(np.asarray(s0), sd["state0"],
                                   atol=2e-5)
        # eigenvector normalised in both paths; sign fixed by convention
        va, vb = np.asarray(vs), sd["vstable"] / np.linalg.norm(sd["vstable"])
        assert min(np.abs(va - vb).max(), np.abs(va + vb).max()) < 1e-4
