"""ADM and VDM tests: forward parity against the reference torch
implementations through the import shims, plus wrapper semantics."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdm_tpu.models.adm import ADM, WrappedADM
from rdm_tpu.models.vdm import VDM
from rdm_tpu.models.torch_import import adm_params_from_torch, vdm_params_from_torch

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    path = os.path.join(GOLD_DIR, name)
    if not os.path.exists(path):
        pytest.skip("run scripts/gen_golden_adm_vdm.py first")
    return np.load(path)


def test_adm_forward_parity():
    g = _load("adm_golden.npz")
    model = ADM(img_resolution=16, in_channels=3, out_channels=3, label_dim=10,
                model_channels=32, channel_mult=(1, 2), channel_mult_emb=2,
                num_blocks=1, attn_resolutions=(8,), dropout=0.0)
    sd = {k.removeprefix("sd."): g[k] for k in g.files if k.startswith("sd.")}
    params = adm_params_from_torch(sd)

    x = jnp.asarray(g["x"]).transpose(0, 2, 3, 1)
    out = model.apply({"params": params}, x, jnp.asarray(g["noise_labels"]),
                      jnp.asarray(g["onehot"]))
    ref = g["out"].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-5)


@pytest.mark.slow
def test_adm_param_count():
    g = _load("adm_golden.npz")
    model = ADM(img_resolution=16, in_channels=3, out_channels=3, label_dim=10,
                model_channels=32, channel_mult=(1, 2), channel_mult_emb=2,
                num_blocks=1, attn_resolutions=(8,), dropout=0.0)
    p = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 16, 16, 3)),
                   jnp.zeros((1,)), jnp.zeros((1, 10)))["params"]
    n = sum(int(np.prod(q.shape)) for q in jax.tree.leaves(p))
    assert n == int(g["n_params"])


def test_vdm_forward_parity():
    g = _load("vdm_golden.npz")
    model = VDM(channels=32, num_blocks=2, attention=True, dropout=0.0,
                num_channels=3, sigma_min=0.01, sigma_max=5.0,
                scale_by_sigma=True)
    sd = {k.removeprefix("sd."): g[k] for k in g.files if k.startswith("sd.")}
    params = vdm_params_from_torch(sd)
    x = jnp.asarray(g["x"]).transpose(0, 2, 3, 1)
    out = model.apply({"params": params}, x, jnp.asarray(g["sigma"]))
    ref = g["out"].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-5)


@pytest.mark.slow
def test_wrapped_adm_one_hot_and_sigma_scaling():
    m = WrappedADM(img_resolution=16, num_channels=3, num_classes=10,
                   model_channels=32, channel_mult=(1, 2), channel_mult_emb=2,
                   num_blocks=1, attn_resolutions=(8,), dropout=0.0,
                   scale_by_sigma=True, dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    sigma = jnp.asarray([0.5, 2.0])
    labels = jnp.asarray([3, 7])
    p = m.init({"params": jax.random.PRNGKey(1)}, x, sigma, labels)["params"]
    # randomise: out_conv and residual-closing convs are zero-init
    keys = jax.random.split(jax.random.PRNGKey(2), len(jax.tree.leaves(p)))
    p = jax.tree.unflatten(jax.tree.structure(p), [
        jax.random.normal(k, q.shape) * 0.1
        for k, q in zip(keys, jax.tree.leaves(p))])
    out = m.apply({"params": p}, x, sigma, labels)
    assert out.shape == x.shape
    # scale_by_sigma: doubling sigma would not double output generally, but
    # with scale off the two paths must differ exactly by the sigma division
    m2 = WrappedADM(img_resolution=16, num_channels=3, num_classes=10,
                    model_channels=32, channel_mult=(1, 2), channel_mult_emb=2,
                    num_blocks=1, attn_resolutions=(8,), dropout=0.0,
                    scale_by_sigma=False, dtype=jnp.float32)
    out2 = m2.apply({"params": p}, x, sigma, labels)
    np.testing.assert_allclose(np.asarray(out * sigma[:, None, None, None]),
                               np.asarray(out2), rtol=1e-5, atol=1e-6)
    # labels vs None differ
    out_un = m.apply({"params": p}, x, sigma, None)
    assert np.abs(np.asarray(out) - np.asarray(out_un)).max() > 1e-6


def test_registry_entries():
    from rdm_tpu.models.registry import get_model
    assert get_model("adm") is WrappedADM
    assert get_model("vdm") is VDM
