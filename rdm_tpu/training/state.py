"""Training state PyTree.

The reference keeps a mutable dict {model, optimizer, ema, step, scaler}
(``run_train.py:86-87``); the TPU-native equivalent is an immutable PyTree
threaded through a jitted step function.  No GradScaler: bf16 on TPU needs
no loss scaling (SURVEY.md section 2.8, mixed precision row).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from rdm_tpu.models import ema as ema_lib


class TrainState(NamedTuple):
    step: jnp.ndarray          # int32 scalar
    params: Any                # live parameters
    opt_state: Any             # optax state
    ema: ema_lib.EMAState      # shadow parameters


def init_train_state(model, tx, config, rng=None, sample_input=None) -> TrainState:
    """Initialise params/optimizer/EMA for a score model."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    if sample_input is None:
        h = config.data.image_size
        w = config.data.get("image_width", h)
        c = config.data.num_channels
        x = jnp.zeros((2, h, w, c), jnp.float32)
        labels = jnp.zeros((2, config.model.get("num_classes", 1)), jnp.float32)
        sample_input = (x, jnp.full((2,), 0.5), labels)
    variables = model.init({"params": rng}, *sample_input)
    params = variables["params"]
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema=ema_lib.init(params, decay=config.model.ema_rate),
    )
