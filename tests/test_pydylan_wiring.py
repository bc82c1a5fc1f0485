"""Pydylan-backend wiring test (VERDICT round-1 item 5).

pydylan (the reference's C++ astrodynamics + SNOPT stack) is absent from
this image, so ``oracle._simulate_pydylan`` could silently drift from
the reference call sequence (``cr3bp_earth_mission_simulator_boundary_
diffusion_warmstart.py:87-224``).  This test injects a recording mock
``pydylan`` module and executes the backend end-to-end, pinning:

* halo solved at ``E_L1 + halo_energy`` and asserted Success (:96-105);
* GTO spiral evaluated to the fixed ``start_bdry`` (:109-112);
* SNOPT options: analytic derivatives, 15000 iterations, optimality
  tolerance 1e-3, solver_mode enum from the config string (:116-127);
* thruster fuel mass re-seeded from the spiral end state (:134-135);
* phase options: segments, coast <= 15, shooting bounds, spherical
  transcription (:128-145);
* boundary conditions: FixedBoundaryCondition(spiral end) ->
  LibrationOrbitBoundaryCondition(halo, StableLeft,
  [E, 0..T_halo, manifold-length window]) (:148-157);
* the halo-period slot of the guess un-normalised by ``orbit_period``
  before injection (:165);
* the result dict layout consumed by the benchmark.
"""
import sys
import types

import numpy as np
import pytest


class _Recorder:
    def __init__(self):
        self.calls = []


def _make_fake_pydylan(rec):
    fake = types.ModuleType("pydylan")

    class _Enum:
        error = "error"

        class LibrationPoint:
            L1 = "L1"

        class OrbitGenerationResult:
            Success = "Success"

        class derivative_mode_type:
            analytic = "analytic"

        class solver_mode_type:
            feasible = "feasible_enum"
            optimal = "optimal_enum"

        class PerturbationDirection:
            StableLeft = "StableLeft"

        spherical = "spherical"
        snopt = "snopt_solver"

    fake.enum = _Enum
    fake.set_logging_severity = lambda lvl: rec.calls.append(("log", lvl))

    class Body:
        def __init__(self, name):
            self.name = name
    fake.Body = Body

    class CR3BP:
        def __init__(self, primary, secondary):
            rec.calls.append(("cr3bp", primary.name, secondary.name))

        def find_equilibrium_point(self, point):
            rec.calls.append(("find_l1", point))
            return np.array([0.8369, 3.0], float)  # (x_L1, E_L1)
    fake.eom = types.SimpleNamespace(CR3BP=CR3BP)

    class Halo:
        def __init__(self, cr3bp, point, energy, n):
            rec.halo_energy_arg = energy
            self.orbit_period = 2.77
            self.orbit_energy = energy

        def solve_for_orbit(self):
            rec.calls.append(("halo_solve",))
            return _Enum.OrbitGenerationResult.Success
    fake.periodic_orbit = types.SimpleNamespace(Halo=Halo)

    class ThrustParameters:
        def __init__(self, fuel_mass, dry_mass, Isp, thrust):
            self.fuel_mass = fuel_mass
            self.dry_mass = dry_mass
            self.Isp = Isp
            self.thrust = thrust
    fake.ThrustParameters = ThrustParameters

    class _Spiral:
        def __init__(self, cr3bp, state, thr):
            rec.calls.append(("spiral_init",))

        def evaluate(self, time_of_flight):
            rec.spiral_tof = time_of_flight

        def get_states(self):
            s = np.zeros((3, 7))
            s[-1] = [0.1, 0.2, 0.0, 0.3, 0.4, 0.0, 752.1]
            return s

        def get_final_states(self):
            return self.get_states()[-1]
    fake.phases = types.SimpleNamespace(lowthrust_spiral=_Spiral)

    class SNOPT_options_structure:
        pass
    fake.SNOPT_options_structure = SNOPT_options_structure

    class phase_options_structure:
        pass
    fake.phase_options_structure = phase_options_structure

    class FixedBoundaryCondition:
        def __init__(self, state):
            rec.start_bc_state = np.asarray(state)
    fake.FixedBoundaryCondition = FixedBoundaryCondition

    class LibrationOrbitBoundaryCondition:
        def __init__(self, halo, direction, lower, upper):
            rec.end_bc = (halo, direction, np.asarray(lower), np.asarray(upper))
    fake.LibrationOrbitBoundaryCondition = LibrationOrbitBoundaryCondition

    class MBH_options_structure:
        pass
    fake.MBH_options_structure = MBH_options_structure

    class Mission:
        def __init__(self, cr3bp, start_bc, end_bc, solver):
            rec.mission_args = (start_bc, end_bc, solver)

        def add_phase_options(self, phase):
            rec.phase = phase

        def set_thruster_parameters(self, thr):
            rec.thruster = thr

        def add_control_initial_guess(self, guess):
            rec.injected_guess = np.asarray(guess).copy()

        def optimize(self, snopt, mbh):
            rec.snopt = snopt
            rec.calls.append(("optimize",))

        def get_control_state(self):
            return rec.injected_guess

        def is_best_solution_feasible(self):
            return True

        def get_SNOPT_inform(self):
            return 1
    fake.Mission = Mission
    return fake


@pytest.fixture()
def fake_pydylan(monkeypatch):
    rec = _Recorder()
    monkeypatch.setitem(sys.modules, "pydylan", _make_fake_pydylan(rec))
    return rec


def test_pydylan_backend_wiring(fake_pydylan):
    from rdm_tpu.physics.oracle import CR3BPEarthMissionWarmstartSimulatorBoundary

    rec = fake_pydylan
    sim = CR3BPEarthMissionWarmstartSimulatorBoundary(
        number_of_segments=20, maximum_shooting_time=40.0,
        minimum_shooting_time=0.0, start_bdry=6.48423370092,
        thrust=1.0, solver_mode="optimal", snopt_time_limit=500.0,
        min_manifold_length=5.0, max_manifold_length=11.0,
        backend="pydylan")

    guess = np.linspace(0.1, 0.9, 66)
    result = sim.simulate(earth_initial_guess=guess, halo_energy=0.02)

    # halo solved at E_L1 + halo_energy, and asserted Success
    assert rec.halo_energy_arg == pytest.approx(3.0 + 0.02)
    assert ("halo_solve",) in rec.calls
    # spiral evaluated to the fixed boundary
    assert rec.spiral_tof == pytest.approx(6.48423370092)
    # SNOPT options (reference :116-127)
    assert rec.snopt.derivative_mode == "analytic"
    assert rec.snopt.total_iteration_limit == 15000
    assert rec.snopt.optimality_tolerance == pytest.approx(1e-3)
    assert rec.snopt.time_limit == pytest.approx(500.0)
    assert rec.snopt.solver_mode == "optimal_enum"
    # thruster fuel mass re-seeded from spiral end state (:134-135)
    assert rec.thruster.fuel_mass == pytest.approx(752.1)
    assert rec.thruster.thrust == pytest.approx(1.0)
    # phase options (:128-145)
    assert rec.phase.number_of_segments == 20
    assert rec.phase.maximum_initial_coast_time == pytest.approx(15.0)
    assert rec.phase.maximum_final_coast_time == pytest.approx(15.0)
    assert rec.phase.maximum_shooting_time == pytest.approx(40.0)
    assert rec.phase.minimum_shooting_time == pytest.approx(0.0)
    assert rec.phase.control_coordinate_transcription == "spherical"
    # boundary conditions (:148-157)
    np.testing.assert_allclose(rec.start_bc_state,
                               [0.1, 0.2, 0.0, 0.3, 0.4, 0.0, 752.1])
    halo, direction, lower, upper = rec.end_bc
    assert direction == "StableLeft"
    np.testing.assert_allclose(lower, [3.02, 0.0, 5.0])
    np.testing.assert_allclose(upper, [3.02, 2.77, 11.0])
    # halo-period slot un-normalised by orbit_period before injection (:165)
    expected = guess.copy()
    expected[-2] = guess[-2] * 2.77
    np.testing.assert_allclose(rec.injected_guess, expected)
    # result dict layout
    assert result["feasibility"] is True
    assert result["snopt_inform"] == 1
    assert result["cost_alpha"] == pytest.approx(0.02)
    np.testing.assert_allclose(result["results.control"], expected)


def test_pydylan_backend_feasible_mode_enum(fake_pydylan):
    from rdm_tpu.physics.oracle import CR3BPEarthMissionWarmstartSimulatorBoundary

    rec = fake_pydylan
    sim = CR3BPEarthMissionWarmstartSimulatorBoundary(
        solver_mode="feasible", backend="pydylan")
    sim.simulate(earth_initial_guess=np.full(66, 0.5), halo_energy=0.05)
    assert rec.snopt.solver_mode == "feasible_enum"
