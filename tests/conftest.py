"""Test harness: force an 8-device virtual CPU mesh BEFORE any JAX backend
initialises.

This is the idiomatic JAX substitute for the reference's missing distributed
test story (SURVEY.md section 4): all sharding/pjit tests run against a
``Mesh`` built from 8 virtual CPU devices, no TPU required.

Note: the environment's ``sitecustomize`` pre-imports jax and pins
``jax_platforms`` to the TPU plugin, so setting ``JAX_PLATFORMS`` in the
environment here is too late — we must override the config value itself
(backends are still uninitialised when conftest runs, so this works).
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # AVX FMA contraction at instruction selection breaks the
    # double-float32 error-free transforms (rdm_tpu/ops/df32.py: the
    # backend self-check note); capping the ISA at SSE4.2 removes FMA
    # from codegen entirely while keeping O3.
    + " --xla_cpu_max_isa=SSE4_2"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    yield


@pytest.fixture(scope="session")
def golden_math():
    path = os.path.join(os.path.dirname(__file__), "golden", "math_golden.npz")
    if not os.path.exists(path):
        pytest.skip("golden math fixtures not generated (scripts/gen_golden_math.py)")
    return np.load(path)
