"""1-D DDPM tests: golden parity of every buffer/conversion/sampler formula
against the legacy reference (fixtures from scripts/gen_golden_diffusion1d.py,
layout transposed torch (B,1,L) -> ours (B,L,1)), plus UNet1D architecture
sanity and constraint-loss behaviour."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdm_tpu.diffusion1d import (GaussianDiffusion1D, cosine_beta_schedule,
                                 linear_beta_schedule)
from rdm_tpu.models.unet1d import UNet1D

GOLD = os.path.join(os.path.dirname(__file__), "golden", "diffusion1d_golden.npz")


class MockModel:
    """out = 0.5 * x — mirrors the torch mock used for the fixtures."""
    channels = 1

    def apply(self, variables, x, t, classes=None, rngs=None, cond_drop_prob=None):
        return 0.5 * x

    def forward_with_cond_scale(self, params, x, t, classes, cond_scale=1.0,
                                rescaled_phi=0.0):
        return 0.5 * x


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLD):
        pytest.skip("run scripts/gen_golden_diffusion1d.py first")
    return np.load(GOLD)


@pytest.fixture(scope="module")
def diff():
    return GaussianDiffusion1D(MockModel(), seq_length=67, timesteps=40,
                               objective="pred_noise", beta_schedule="cosine")


def _tr(a):  # torch (B, 1, L) -> ours (B, L, 1)
    return jnp.asarray(a).transpose(0, 2, 1)


def test_schedules_golden(golden, diff):
    np.testing.assert_allclose(np.asarray(diff.betas), golden["betas"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(diff.alphas_cumprod),
                               golden["alphas_cumprod"], rtol=1e-6)
    np.testing.assert_allclose(linear_beta_schedule(40).astype(np.float32),
                               golden["linear_betas"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(diff.posterior_variance),
                               golden["posterior_variance"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(diff.posterior_log_variance_clipped),
                               golden["posterior_log_variance_clipped"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(diff.posterior_mean_coef1),
                               golden["posterior_mean_coef1"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(diff.posterior_mean_coef2),
                               golden["posterior_mean_coef2"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(diff.loss_weight),
                               golden["loss_weight"], rtol=1e-6)


def test_forward_conversions_golden(golden, diff):
    x0, noise, t = _tr(golden["x_start"]), _tr(golden["noise"]), jnp.asarray(golden["t"])
    x_t = diff.q_sample(x0, t, noise)
    np.testing.assert_allclose(np.asarray(x_t), _tr(golden["x_t"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(diff.predict_start_from_noise(x_t, t, noise)),
                               _tr(golden["pred_x0"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(diff.predict_v(x0, t, noise)),
                               _tr(golden["v"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(diff.predict_start_from_v(x_t, t, _tr(golden["v"]))),
                               _tr(golden["x0_from_v"]), rtol=1e-4, atol=1e-4)
    mean, var, logvar = diff.q_posterior(x0, x_t, t)
    np.testing.assert_allclose(np.asarray(mean), _tr(golden["post_mean"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logvar)[:, 0, 0],
                               golden["post_logvar"][:, 0, 0], rtol=1e-4)


def test_p_mean_variance_golden(golden, diff):
    x_t, t = _tr(golden["x_t"]), jnp.asarray(golden["t"])
    classes = jnp.asarray(golden["classes"])
    mean, var, logvar, x0_hat = diff.p_mean_variance(None, x_t, t, classes, 6.0, 0.7)
    np.testing.assert_allclose(np.asarray(mean), _tr(golden["p_mean"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x0_hat), _tr(golden["x0_hat"]), rtol=1e-4, atol=1e-5)


def test_loss_na_golden(golden, diff):
    x0, noise, t = _tr(golden["x_start"]), _tr(golden["noise"]), jnp.asarray(golden["t"])
    classes = jnp.asarray(golden["classes"])
    loss = diff.p_losses(None, jax.random.PRNGKey(0), x0, t, classes, noise=noise)
    np.testing.assert_allclose(float(loss), float(golden["loss_na"]), rtol=1e-4)


def test_ddim_trajectory_golden(golden):
    diff = GaussianDiffusion1D(MockModel(), seq_length=67, timesteps=40,
                               sampling_timesteps=10, objective="pred_noise",
                               beta_schedule="cosine")
    assert diff.is_ddim_sampling
    z0 = _tr(golden["z0"])
    classes = jnp.asarray(golden["classes"])
    out = diff.ddim_sample(None, jax.random.PRNGKey(0), classes,
                           z0.shape, cond_scale=6.0, z=z0)
    np.testing.assert_allclose(np.asarray(out), _tr(golden["ddim_out"]),
                               rtol=1e-4, atol=1e-5)


def test_constraint_loss_types():
    """All constraint loss types run and differ from the base MSE."""
    def constraint_fn(x_flat, classes, scale):
        # toy: penalise mass of the first column above its class label
        return jnp.abs(x_flat[:, 0] - classes[:, 0]) * scale

    base = GaussianDiffusion1D(MockModel(), seq_length=8, timesteps=16,
                               constraint_loss_type="NA")
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 8, 1))
    classes = jax.random.uniform(jax.random.PRNGKey(1), (4, 1))
    key = jax.random.PRNGKey(2)
    l_base = float(base(None, key, x, classes))
    assert np.isfinite(l_base)

    for clt in ("one_over_t", "gt_threshold", "gt_scaled", "gt_std",
                "gt_std_absolute", "gt_std_threshold", "gt_log_likelihood"):
        d = GaussianDiffusion1D(MockModel(), seq_length=8, timesteps=16,
                                constraint_loss_type=clt,
                                constraint_gt_sample_num=4,
                                constraint_violation_weight=1.0,
                                constraint_fn=constraint_fn)
        l = float(d(None, key, x, classes))
        assert np.isfinite(l), clt

    with pytest.raises(ValueError):
        GaussianDiffusion1D(MockModel(), seq_length=8, timesteps=16,
                            constraint_loss_type="gt_std")


@pytest.mark.slow
def test_unet1d_shapes_and_cfg():
    model = UNet1D(dim=32, dim_mults=(1, 2, 4), seq_length=67, class_dim=1,
                   embed_class_layers_dims=(32, 32), cond_drop_prob=0.0)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 67, 1))
    t = jnp.asarray([3.0, 11.0])
    classes = jnp.ones((2, 1)) * 0.4
    params = model.init({"params": jax.random.PRNGKey(1)}, x, t, classes)["params"]
    out = model.apply({"params": params}, x, t, classes)
    assert out.shape == (2, 67, 1)
    # CFG: cond_scale=1 equals the plain conditional forward
    cfg1 = model.forward_with_cond_scale(params, x, t, classes, cond_scale=1.0)
    np.testing.assert_allclose(np.asarray(cfg1), np.asarray(out), rtol=1e-5, atol=1e-6)
    # cond_scale=5 differs (mask_val null branch kicks in)
    cfg5 = model.forward_with_cond_scale(params, x, t, classes, cond_scale=5.0)
    assert np.abs(np.asarray(cfg5) - np.asarray(out)).max() > 1e-7
    # rescaled-phi variant stays finite
    cfgp = model.forward_with_cond_scale(params, x, t, classes, cond_scale=5.0,
                                         rescaled_phi=0.7)
    assert np.isfinite(np.asarray(cfgp)).all()


def test_unet1d_in_registry():
    from rdm_tpu.models.registry import get_model
    assert get_model("unet1d") is UNet1D


@pytest.mark.slow
def test_unet1d_end_to_end_ancestral_sampling():
    """Tiny UNet1D + tiny chain: sampling produces the right shape/range."""
    model = UNet1D(dim=16, dim_mults=(1, 2, 4), seq_length=67,
                   embed_class_layers_dims=(16, 16), cond_drop_prob=0.0,
                   resnet_block_groups=4)
    x = jnp.zeros((2, 67, 1))
    params = model.init({"params": jax.random.PRNGKey(0)}, x,
                        jnp.zeros((2,)), jnp.zeros((2, 1)))["params"]
    diff = GaussianDiffusion1D(model, seq_length=67, timesteps=8)
    classes = jnp.asarray([[0.3], [0.8]])
    out = jax.jit(lambda p, k: diff.sample(p, k, classes, cond_scale=1.5))(
        params, jax.random.PRNGKey(3))
    assert out.shape == (2, 67, 1)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_unet1d_legacy_forward_parity():
    """Forward parity of UNet1D(legacy=True) against the legacy torch model
    through the weight-import shim (fixtures from
    scripts/gen_golden_unet1d.py)."""
    path = os.path.join(os.path.dirname(__file__), "golden", "unet1d_golden.npz")
    if not os.path.exists(path):
        pytest.skip("run scripts/gen_golden_unet1d.py first")
    g = np.load(path)
    from rdm_tpu.models.torch_import import unet1d_params_from_torch

    model = UNet1D(dim=16, channels=1, dim_mults=(1, 2, 4),
                   embed_class_layers_dims=(16, 16), class_dim=1,
                   cond_drop_prob=0.0, mask_val=-1.0, seq_length=66,
                   legacy=True)
    sd = {k.removeprefix("sd."): g[k] for k in g.files if k.startswith("sd.")}
    params = unet1d_params_from_torch(sd)

    # param-count parity
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n == int(g["n_params"])
    # tree identical to a fresh init
    x0 = jnp.zeros((1, 66, 1))
    pinit = model.init({"params": jax.random.PRNGKey(0)}, x0,
                       jnp.zeros((1,)), jnp.zeros((1, 1)))["params"]
    assert jax.tree.structure(jax.tree.map(lambda v: v.shape, pinit)) == \
        jax.tree.structure(jax.tree.map(lambda v: v.shape, params))

    x = jnp.asarray(g["x"]).transpose(0, 2, 1)  # (B,1,L) -> (B,L,1)
    t = jnp.asarray(g["t"])
    classes = jnp.asarray(g["classes"])
    out = model.apply({"params": params}, x, t, classes, cond_drop_prob=0.0)
    ref = g["out"].transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-5)

    out_cfg = model.forward_with_cond_scale(params, x, t, classes, cond_scale=5.0)
    ref_cfg = g["out_cfg"].transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(out_cfg), ref_cfg, rtol=5e-4, atol=5e-4)


def test_interpolate():
    """Latent interpolation (reference :860-877) returns valid sequences."""
    diff = GaussianDiffusion1D(MockModel(), seq_length=8, timesteps=12)
    x1 = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 1)) * 2 - 1
    x2 = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 1)) * 2 - 1
    classes = jnp.zeros((2, 1))
    out = diff.interpolate(None, jax.random.PRNGKey(2), x1, x2, classes, lam=0.3)
    assert out.shape == x1.shape
    assert np.isfinite(np.asarray(out)).all()
