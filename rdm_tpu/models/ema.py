"""Exponential moving average of a parameter PyTree.

Functional rebuild of the reference EMA (``models/ema.py:10-99``): shadow
params are a PyTree, decay warms up as ``min(decay, (1+n)/(10+n))``, and the
update is a single fused tree-map — no per-parameter Python loop, so under
jit it compiles into the train step.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    decay: float
    num_updates: jnp.ndarray  # int32 scalar
    shadow_params: Any


def init(params, decay: float, use_num_updates: bool = True) -> EMAState:
    if not 0.0 <= decay <= 1.0:
        raise ValueError("Decay must be between 0 and 1")
    n = jnp.asarray(0 if use_num_updates else -1, jnp.int32)
    return EMAState(decay=decay, num_updates=n,
                    shadow_params=jax.tree.map(jnp.asarray, params))


def update(state: EMAState, params) -> EMAState:
    """One EMA step (reference ``ema.py:32-52``): decay warmup
    ``min(decay, (1+n)/(10+n))`` then ``s -= (1-d) * (s - p)``."""
    n = jnp.where(state.num_updates >= 0, state.num_updates + 1, state.num_updates)
    decay = jnp.where(
        n >= 0,
        jnp.minimum(state.decay, (1.0 + n) / (10.0 + n)),
        state.decay,
    )
    one_minus = (1.0 - decay).astype(jnp.float32)
    shadow = jax.tree.map(
        lambda s, p: s - (one_minus * (s - p)).astype(s.dtype),
        state.shadow_params, params)
    return EMAState(decay=state.decay, num_updates=n, shadow_params=shadow)


def copy_to(state: EMAState):
    """Return the shadow params (reference ``copy_to``); being functional we
    simply hand back the tree — callers swap by using it instead of the live
    params (no store/restore dance needed)."""
    return state.shadow_params
