"""Checkpoint parity tests: our .pth loads into the REFERENCE model with
strict=True, reference checkpoints load into us, and native round trips
are lossless."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdm_tpu.config import load_config
from rdm_tpu.models import NCSNpp
from rdm_tpu.sde import RVESDE
from rdm_tpu.training import get_optimizer, init_train_state, make_train_step
from rdm_tpu.training import checkpoints

REF = "/root/reference/Reflected-Diffusion"


@pytest.fixture(scope="module")
def world():
    cfg = load_config("train")
    model = NCSNpp.from_config(cfg)
    tx = get_optimizer(cfg)
    state = init_train_state(model, tx, cfg, rng=jax.random.PRNGKey(0))
    return cfg, model, tx, state


def _advance(state, model, tx, cfg, n=2):
    sde = RVESDE(0.01, 5.0, 100)
    step = jax.jit(make_train_step(sde, model, tx))
    batch = jax.random.uniform(jax.random.PRNGKey(5), (4, 9, 9, 1))
    labels = batch[:, 0, 0, :]
    for i in range(n):
        state, _ = step(state, batch, labels, jax.random.PRNGKey(i))
    return state


@pytest.mark.slow
def test_native_roundtrip_lossless(tmp_path, world):
    cfg, model, tx, state = world
    state = _advance(state, model, tx, cfg)
    path = str(tmp_path / "checkpoint_1.pth")
    checkpoints.save_checkpoint(path, jax.device_get(state), config=cfg)

    fresh = init_train_state(model, tx, cfg, rng=jax.random.PRNGKey(9))
    restored = checkpoints.restore_checkpoint(path, fresh)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(restored.ema.shadow_params),
                    jax.tree.leaves(state.ema.shadow_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments restored too
    for a, b in zip(jax.tree.leaves(restored.opt_state), jax.tree.leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_missing_checkpoint_returns_state(tmp_path, world):
    cfg, model, tx, state = world
    out = checkpoints.restore_checkpoint(str(tmp_path / "nope" / "checkpoint.pth"), state)
    assert out is state


def test_our_pth_loads_into_reference_model_strict(tmp_path, world):
    """The strongest parity check: torch.load our checkpoint and
    load_state_dict(strict=True) into the reference NCSNpp, then verify the
    reference EMA loads our shadow list."""
    cfg, model, tx, state = world
    path = str(tmp_path / "checkpoint_1.pth")
    checkpoints.save_checkpoint(path, jax.device_get(state), config=cfg)

    sys.path.insert(0, REF)
    try:
        import torch
        from types import SimpleNamespace
        sys.modules.pop("models", None)  # avoid cross-test module aliasing
        from models.ncsnpp import NCSNpp as RefNCSNpp
        from models.ema import ExponentialMovingAverage

        m = cfg.model.to_plain()
        ref_cfg = SimpleNamespace(model=SimpleNamespace(**m))
        ref_model = RefNCSNpp(ref_cfg)
        loaded = torch.load(path, map_location="cpu", weights_only=False)
        missing, unexpected = ref_model.load_state_dict(loaded["model"], strict=True), None
        ema = ExponentialMovingAverage(ref_model.parameters(), decay=cfg.model.ema_rate)
        ema.load_state_dict(loaded["ema"])
        assert len(ema.shadow_params) == sum(
            1 for p in ref_model.parameters() if p.requires_grad)
        for s, p in zip(ema.shadow_params,
                        [p for p in ref_model.parameters() if p.requires_grad]):
            assert s.shape == p.shape
    finally:
        sys.path.remove(REF)


def test_reference_pth_loads_into_us(tmp_path, world):
    """Simulate a reference-produced checkpoint (torch state_dict naming, no
    native side-channel) and restore it into our TrainState."""
    cfg, model, tx, state = world
    import torch
    from rdm_tpu.models.torch_import import (ncsnpp_params_to_torch,
                                             ncsnpp_ema_param_order)

    sd = {k: torch.from_numpy(np.ascontiguousarray(v * 0 + 0.25))
          for k, v in ncsnpp_params_to_torch(jax.device_get(state.params)).items()}
    order = ncsnpp_ema_param_order(sd.keys())
    ref_ckpt = {
        "step": 1234,
        "model": sd,
        "optimizer": {"state": {}, "param_groups": []},
        "ema": {"decay": 0.999, "num_updates": 77,
                "shadow_params": [sd[k] * 2 for k in order]},
        "scaler": None,
        "config": cfg.to_plain(),
    }
    path = str(tmp_path / "ref.pth")
    torch.save(ref_ckpt, path)

    restored = checkpoints.restore_checkpoint(path, state)
    assert int(restored.step) == 1234
    assert int(restored.ema.num_updates) == 77
    np.testing.assert_allclose(
        np.asarray(restored.params["out_conv"]["conv"]["bias"]), 0.25)
    np.testing.assert_allclose(
        np.asarray(restored.ema.shadow_params["out_conv"]["conv"]["bias"]), 0.5)
    # frozen fourier W: EMA shadow falls back to the live value
    np.testing.assert_allclose(
        np.asarray(restored.ema.shadow_params["time_embed"]["W"]), 0.25)


def test_latest_checkpoint(tmp_path):
    d = tmp_path / "checkpoints"
    d.mkdir()
    for k in (1, 3, 12):
        (d / f"checkpoint_{k}.pth").write_bytes(b"x")
    assert checkpoints.latest_checkpoint(str(d)).endswith("checkpoint_12.pth")
    assert checkpoints.latest_checkpoint(str(tmp_path / "none")) is None


@pytest.mark.slow
def test_orbax_roundtrip(tmp_path, world):
    cfg, model, tx, state = world
    state = _advance(state, model, tx, cfg, n=1)
    path = str(tmp_path / "orbax_ckpt")
    checkpoints.save_checkpoint_orbax(path, jax.device_get(state))

    fresh = init_train_state(model, tx, cfg, rng=jax.random.PRNGKey(11))
    restored = checkpoints.restore_checkpoint_orbax(path, fresh)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(restored.ema.shadow_params),
                    jax.tree.leaves(state.ema.shadow_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
