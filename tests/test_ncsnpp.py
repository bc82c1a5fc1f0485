"""NCSN++ architecture tests: shape/param parity with the documented GTO
config and forward parity against the reference implementation through the
torch weight-import shim."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdm_tpu.models import NCSNpp
from rdm_tpu.models.torch_import import ncsnpp_params_from_torch

GOLD = os.path.join(os.path.dirname(__file__), "golden", "ncsnpp_golden.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLD):
        pytest.skip("run scripts/gen_golden_ncsnpp.py first")
    return np.load(GOLD)


@pytest.fixture(scope="module")
def model():
    return NCSNpp()  # defaults == GTO config (configs/model/ncsnpp.yaml)


@pytest.fixture(scope="module")
def init_params(model):
    x = jnp.zeros((2, 9, 9, 1))
    sigma = jnp.full((2,), 0.5)
    labels = jnp.zeros((2, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, sigma, labels)
    return variables["params"]


def test_param_count_matches_reference(init_params, golden):
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(init_params))
    assert n == int(golden["n_params"])  # 6,254,913 for the GTO config


def test_output_shape(model, init_params):
    x = jnp.zeros((3, 9, 9, 1))
    out = model.apply({"params": init_params}, x, jnp.full((3,), 0.5), jnp.zeros((3, 1)))
    assert out.shape == (3, 9, 9, 1)


@pytest.mark.slow
def test_fresh_init_outputs_near_zero(model, init_params):
    # The output conv is near-zero-init (init_scale=0 -> variance 1e-10,
    # i.e. weights ~3e-6, reference layers.py:73-77), so a fresh model
    # scores ~1e-5 — important for stable early training.
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 9, 9, 1))
    out = model.apply({"params": init_params}, x, jnp.full((4,), 0.5), jnp.zeros((4, 1)))
    assert float(jnp.abs(out).max()) < 1e-3


def test_forward_parity_with_reference(model, golden):
    sd = {k.removeprefix("sd."): golden[k] for k in golden.files if k.startswith("sd.")}
    params = ncsnpp_params_from_torch(sd)

    x = jnp.asarray(golden["x"]).transpose(0, 2, 3, 1)  # NCHW -> NHWC
    sigma = jnp.asarray(golden["sigma"])
    labels = jnp.asarray(golden["labels"])

    out_cond = model.apply({"params": params}, x, sigma, labels)
    out_uncond = model.apply({"params": params}, x, sigma, jnp.zeros_like(labels))

    ref_cond = golden["out_cond"].transpose(0, 2, 3, 1)
    ref_uncond = golden["out_uncond"].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out_cond), ref_cond, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_uncond), ref_uncond, rtol=1e-4, atol=1e-5)
    # conditioning actually matters on these fixtures
    assert np.abs(ref_cond - ref_uncond).max() > 1e-4


def test_imported_tree_structure_matches_init(model, init_params, golden):
    sd = {k.removeprefix("sd."): golden[k] for k in golden.files if k.startswith("sd.")}
    params = ncsnpp_params_from_torch(sd)
    ours = jax.tree.structure(jax.tree.map(lambda x: x.shape, init_params))
    theirs = jax.tree.structure(jax.tree.map(lambda x: x.shape, params))
    assert ours == theirs
    chex_shapes_ok = jax.tree.all(jax.tree.map(
        lambda a, b: a.shape == b.shape, init_params, params))
    assert chex_shapes_ok


def test_cond_drop_changes_train_forward(model, init_params, golden):
    sd = {k.removeprefix("sd."): golden[k] for k in golden.files if k.startswith("sd.")}
    params = ncsnpp_params_from_torch(sd)
    x = jnp.asarray(golden["x"]).transpose(0, 2, 3, 1)
    sigma = jnp.asarray(golden["sigma"])
    labels = jnp.ones((x.shape[0], 1))
    out = []
    for seed in (0, 1):
        out.append(model.apply(
            {"params": params}, x, sigma, labels, train=True,
            rngs={"dropout": jax.random.PRNGKey(seed),
                  "cond_drop": jax.random.PRNGKey(seed + 10)}))
    # different dropout/cond-drop rngs give different outputs in train mode
    assert float(jnp.abs(out[0] - out[1]).max()) > 0


def test_jit_and_grad(model, init_params):
    @jax.jit
    def loss(params, x, sigma, labels):
        out = NCSNpp().apply({"params": params}, x, sigma, labels)
        return jnp.sum(out ** 2)

    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 9, 9, 1))
    g = jax.grad(loss)(init_params, x, jnp.full((2,), 0.3), jnp.zeros((2, 1)))
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(t)).all() for t in flat)
    # Fourier W is frozen via stop_gradient
    assert float(jnp.abs(g["time_embed"]["W"]).max()) == 0.0


@pytest.mark.slow
def test_ddpmpp_config_builds():
    """The CIFAR ddpmpp config path builds and forward-runs (scaled-down nf
    for CPU speed; topology/attn schedule preserved: 4 levels, attn@16)."""
    from rdm_tpu.config import load_config
    cfg = load_config("train", overrides=[
        "model=ddpmpp", "data=cifar10", "model.nf=8", "model.num_res_blocks=1",
        "model.channels=3", "model.image_size=32", "model.num_classes=1",
        "model.cond_drop_prob=0.0", "model.conditional=false"])
    m = NCSNpp.from_config(cfg)
    assert m.ch_mult == (1, 2, 2, 2) and m.attn_resolutions == (16,)
    x = jnp.zeros((1, 32, 32, 3))
    p = m.init({"params": jax.random.PRNGKey(0)}, x, jnp.full((1,), 0.5))["params"]
    out = m.apply({"params": p}, x, jnp.full((1,), 0.5))
    assert out.shape == (1, 32, 32, 3)
