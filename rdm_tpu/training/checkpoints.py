"""Checkpoint I/O with reference torch-pickle parity.

The reference persists ``torch.save`` pickles
``{step, model, optimizer, ema, scaler, config}``
(``Reflected-Diffusion/utils.py:77-86``) — BASELINE.json asks for
checkpoint-format parity.  torch (CPU) is available in this image, so:

* ``save_checkpoint(path, state, config)`` writes exactly that layout:
  the model/EMA state dicts in reference naming (OIHW convs, EMA
  ``shadow_params`` as a list in ``parameters()`` order), the optax state
  stashed under the ``optimizer`` key (a dict the reference loader ignores
  gracefully only on our side — reference resume of our optimizer state is
  not meaningful across frameworks), ``scaler: None`` and the plain config.
* ``restore_checkpoint(path, state, ...)`` loads BOTH our checkpoints and
  checkpoints produced by the reference training run (whose optimizer
  state is then ignored: fresh optax state).
* Missing file -> warn and return the input state unchanged (reference
  ``utils.py:49-53`` preemption-resume semantics).

Model-family note: the naming shims currently cover NCSN++ (the flagship);
other model families fall back to a native ``flax.serialization`` payload
embedded in the same pickle under ``native_params`` keys.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import numpy as np

from rdm_tpu.models import ema as ema_lib
from rdm_tpu.models.torch_import import (ncsnpp_ema_param_order,
                                         ncsnpp_params_from_torch,
                                         ncsnpp_params_to_torch)
from .state import TrainState


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: TrainState, config=None,
                    model_name: str = "ncsnpp") -> None:
    import torch

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    is_ncsnpp = model_name == "ncsnpp"

    if is_ncsnpp:
        model_sd = {k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in ncsnpp_params_to_torch(state.params).items()}
        ema_sd_full = ncsnpp_params_to_torch(state.ema.shadow_params)
        ema_entry = {
            "decay": float(state.ema.decay),
            "num_updates": int(state.ema.num_updates),
            "shadow_params": [torch.from_numpy(np.ascontiguousarray(ema_sd_full[k]))
                              for k in ncsnpp_ema_param_order(model_sd.keys())],
        }
    else:
        model_sd = {}
        ema_entry = {"decay": float(state.ema.decay),
                     "num_updates": int(state.ema.num_updates),
                     "shadow_params": []}

    checkpoint = {
        "step": int(state.step),
        "model": model_sd,
        "optimizer": {"optax_state": _to_numpy_tree(state.opt_state)},
        "ema": ema_entry,
        "scaler": None,
        "config": config.to_plain() if hasattr(config, "to_plain") else config,
        # Native side-channel: exact Flax trees for lossless resume.
        "native_params": _to_numpy_tree(state.params),
        "native_ema_shadow": _to_numpy_tree(state.ema.shadow_params),
    }
    torch.save(checkpoint, path)


def restore_checkpoint(path: str, state: TrainState,
                       model_name: str = "ncsnpp") -> TrainState:
    """Load a checkpoint into ``state``; missing file returns ``state``
    with a warning (reference semantics)."""
    import torch

    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        logging.warning(f"No checkpoint found at {path}. "
                        f"Returned the same state as input")
        return state

    loaded = torch.load(path, map_location="cpu", weights_only=False)

    if "native_params" in loaded:  # our checkpoint: lossless
        params = jax.tree.map(lambda _, v: v, state.params, loaded["native_params"])
        shadow = jax.tree.map(lambda _, v: v, state.ema.shadow_params,
                              loaded["native_ema_shadow"])
        opt_state = state.opt_state
        stashed = loaded.get("optimizer", {}).get("optax_state")
        if stashed is not None:
            opt_state = jax.tree.map(lambda _, v: v, state.opt_state, stashed)
    else:  # reference-produced checkpoint: convert the torch state dicts
        if model_name != "ncsnpp":
            raise NotImplementedError(
                f"torch-checkpoint import implemented for ncsnpp, got {model_name}")
        sd = {k: v.detach().cpu().numpy() for k, v in loaded["model"].items()}
        params = ncsnpp_params_from_torch(sd)
        ema_entry = loaded.get("ema") or {}
        shadows = ema_entry.get("shadow_params")
        if shadows is not None:
            order = ncsnpp_ema_param_order(sd.keys())
            ema_sd = dict(sd)  # frozen W keeps the live value
            for key, tensor in zip(order, shadows):
                ema_sd[key] = tensor.detach().cpu().numpy()
            shadow = ncsnpp_params_from_torch(ema_sd)
        else:
            shadow = params
        opt_state = state.opt_state  # torch Adam state is not transferable

    ema = ema_lib.EMAState(
        decay=state.ema.decay,
        num_updates=np.int32((loaded.get("ema") or {}).get("num_updates",
                                                           int(state.ema.num_updates))),
        shadow_params=shadow)
    return TrainState(step=np.int32(loaded["step"]), params=params,
                      opt_state=opt_state, ema=ema)


def _state_to_tree(state: TrainState) -> dict:
    return {
        "step": np.asarray(state.step),
        "params": _to_numpy_tree(state.params),
        "opt_state": _to_numpy_tree(state.opt_state),
        "ema_shadow": _to_numpy_tree(state.ema.shadow_params),
        "ema_num_updates": np.asarray(state.ema.num_updates),
        "ema_decay": np.asarray(state.ema.decay, np.float32),
    }


def save_checkpoint_orbax(path: str, state: TrainState) -> None:
    """Native TPU checkpoint via Orbax (async-capable, multi-host sharded
    saves on real pods).  The torch-pickle format remains the
    reference-parity interchange; this is the production-native option
    (SURVEY.md section 5 checkpoint/resume note)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), _state_to_tree(jax.device_get(state)),
               force=True)
    ckptr.wait_until_finished()


def restore_checkpoint_orbax(path: str, state: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(path),
                         _state_to_tree(jax.device_get(state)))
    ema = ema_lib.EMAState(decay=float(tree["ema_decay"]),
                           num_updates=np.int32(tree["ema_num_updates"]),
                           shadow_params=tree["ema_shadow"])
    return TrainState(step=np.int32(tree["step"]), params=tree["params"],
                      opt_state=jax.tree.map(lambda _, v: v, state.opt_state,
                                             tree["opt_state"]),
                      ema=ema)


def latest_checkpoint(checkpoint_dir: str) -> Optional[str]:
    """Find the newest ``checkpoint_{k}.pth`` (reference search order:
    ``checkpoints-meta`` first, then highest k — ``gto_halo_benchmarking.py:155-163``)."""
    if not os.path.isdir(checkpoint_dir):
        return None
    best_k, best = -1, None
    for name in os.listdir(checkpoint_dir):
        if name.startswith("checkpoint_") and name.endswith(".pth"):
            try:
                k = int(name[len("checkpoint_"):-len(".pth")])
            except ValueError:
                continue
            if k > best_k:
                best_k, best = k, os.path.join(checkpoint_dir, name)
    return best
