"""Training-dynamics parity vs the reference torch implementation.

Forward goldens (1e-4) and sampling-distribution KS parity pin the
*inference* path; this test pins the remaining semantic surface — the
loss + backward + optimizer chain (reference
``Reflected-Diffusion/losses.py:52-160``): shared initial weights are
exported through the torch checkpoint shim, both frameworks take K
training steps on IDENTICAL batch/noise/time sequences, and the per-step
loss curves and final parameters must agree within f32 tolerance.

Composition on the torch side mirrors ``get_sde_loss_fn``/``get_step_fn``
call-for-call using the reference's own ``cube``/``sde_lib``/
``models.utils``/``optimization_manager`` — minus the per-step NaN-hook
registration leak (``losses.py:98-104``), which changes no numbers.
Randomness (t, z) is drawn once in numpy and injected into BOTH sides
(our ``loss_fn`` takes ``t=``/``z=`` overrides for exactly this test),
so the comparison is deterministic.
"""
import os
import sys

import jax
import numpy as np
import pytest

from rdm_tpu.config import load_config
from rdm_tpu.models import NCSNpp
from rdm_tpu.models.torch_import import ncsnpp_params_to_torch
from rdm_tpu.sde import RVESDE
from rdm_tpu.training import get_optimizer, init_train_state, make_train_step

REF = "/root/reference/Reflected-Diffusion"

K_STEPS = 40
BATCH = 8
EPS = 1e-5


@pytest.fixture(scope="module")
def parity_cfg():
    # dropout/cond-drop are the only in-model RNG consumers — pin both to
    # 0 so the two frameworks' independent RNG streams cannot diverge the
    # dynamics; everything else is the GTO train.yaml contract.
    return load_config("train", overrides=[
        "model.nf=16", "model.ch_mult=[1,2]", "model.num_res_blocks=1",
        "model.dropout=0.0", "model.cond_drop_prob=0.0",
        "optim.warmup=10"])


def _torch_run(cfg, init_sd, batches, labels_seq, ts, zs):
    """K reference-semantics train steps; returns (losses, final state_dict)."""
    sys.path.insert(0, REF)
    try:
        import torch
        from types import SimpleNamespace
        sys.modules.pop("models", None)  # avoid cross-test module aliasing
        sys.modules.pop("cube", None)
        sys.modules.pop("sde_lib", None)
        sys.modules.pop("losses", None)
        import cube
        import sde_lib
        import losses as ref_losses
        from models import utils as mutils
        from models.ncsnpp import NCSNpp as RefNCSNpp

        torch.manual_seed(0)
        m = cfg.model.to_plain()
        ref_cfg = SimpleNamespace(model=SimpleNamespace(**m))
        model = RefNCSNpp(ref_cfg)
        model.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in init_sd.items()}, strict=True)
        model.train()

        sde = sde_lib.RVESDE(sigma_min=cfg.sde.sigma_min,
                             sigma_max=cfg.sde.sigma_max,
                             N=cfg.sde.num_scales)
        # YAML 1.1 parses `1e-8` (no dot) as a string; our get_optimizer
        # coerces with float(opt.eps) — do the same for the torch side.
        optim_plain = {k: (float(v) if isinstance(v, str) and
                           v.replace(".", "").replace("-", "").replace("+", "")
                           .replace("e", "").isdigit() else v)
                       for k, v in cfg.optim.to_plain().items()}
        opt_cfg = SimpleNamespace(optim=SimpleNamespace(**optim_plain))
        optimizer = ref_losses.get_optimizer(opt_cfg, model.parameters())
        optimize_fn = ref_losses.optimization_manager(opt_cfg)
        score_fn = mutils.get_score_fn(sde, model, train=True)

        losses_out = []
        for k in range(K_STEPS):
            batch = torch.from_numpy(batches[k]).permute(0, 3, 1, 2).contiguous()
            labels = torch.from_numpy(labels_seq[k])
            t = torch.from_numpy(ts[k])
            z = torch.from_numpy(zs[k]).permute(0, 3, 1, 2).contiguous()

            optimizer.zero_grad()
            # get_sde_loss_fn body (losses.py:68-95) with injected t/z,
            # reduce_mean=False, likelihood_weighting=False — the
            # get_step_fn(train=True) configuration (losses.py:110-160)
            mean, std = sde.marginal_prob(batch, t)
            perturbed = cube.reflect(mean + std[:, None, None, None] * z)
            score = score_fn(perturbed, t, class_labels=labels)
            target = cube.score_hk(perturbed, mean, std)
            l = (std ** 2)[:, None, None, None] * (score - target).pow(2)
            loss = (0.5 * l.reshape(l.shape[0], -1).sum(dim=-1)).mean()
            loss.backward()
            optimize_fn(optimizer, model.parameters(), step=k)
            losses_out.append(float(loss.detach()))

        final_sd = {k: v.detach().numpy().copy()
                    for k, v in model.state_dict().items()}
        return losses_out, final_sd
    finally:
        sys.path.remove(REF)


@pytest.mark.slow
def test_training_dynamics_match_reference(parity_cfg):
    cfg = parity_cfg
    rs = np.random.RandomState(42)
    batches = rs.uniform(0.05, 0.95, (K_STEPS, BATCH, 9, 9, 1)).astype(np.float32)
    labels_seq = rs.uniform(0, 1, (K_STEPS, BATCH, 1)).astype(np.float32)
    ts = rs.uniform(EPS, 1.0, (K_STEPS, BATCH)).astype(np.float32)
    zs = rs.standard_normal((K_STEPS, BATCH, 9, 9, 1)).astype(np.float32)

    model = NCSNpp.from_config(cfg)
    tx = get_optimizer(cfg)
    state = init_train_state(model, tx, cfg, rng=jax.random.PRNGKey(7))
    init_sd = ncsnpp_params_to_torch(jax.device_get(state.params))

    sde = RVESDE(cfg.sde.sigma_min, cfg.sde.sigma_max, cfg.sde.num_scales)
    step_fn = jax.jit(make_train_step(sde, model, tx))

    jax_losses = []
    for k in range(K_STEPS):
        state, loss = step_fn(state, batches[k], labels_seq[k],
                              jax.random.PRNGKey(k), t=ts[k], z=zs[k])
        jax_losses.append(float(loss))

    torch_losses, torch_final = _torch_run(
        cfg, init_sd, batches, labels_seq, ts, zs)

    jax_losses = np.asarray(jax_losses)
    torch_losses = np.asarray(torch_losses)
    # identical data, noise, and update rule: curves must track within
    # f32 accumulation noise (NHWC/XLA vs NCHW/ATen reduction orders)
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=5e-3, atol=5e-3)
    # the loss must actually move (this is a *dynamics* test, not a
    # constant-function coincidence)
    assert jax_losses[-1] < jax_losses[0]

    # final parameters: compare the exported tree against torch's
    final_ours = ncsnpp_params_to_torch(jax.device_get(state.params))
    worst = 0.0
    for name, ours in final_ours.items():
        theirs = torch_final[name]
        denom = np.maximum(np.abs(theirs), 1e-3)
        err = float(np.max(np.abs(ours - theirs) / denom))
        worst = max(worst, err)
        assert err < 5e-2, f"{name}: rel err {err:.2e} after {K_STEPS} steps"
    # typical drift should be far below the per-tensor bound
    assert worst < 5e-2
