"""Score-matching loss, optimizer chain, and jittable train/eval steps.

Rebuild of reference ``Reflected-Diffusion/losses.py`` as pure functions:

* loss (``losses.py:52-107``): t ~ U(eps, T); z ~ N(0, 1);
  perturbed = reflect(mean + std z); target = score_hk(perturbed, mean, std);
  loss = weight * ||score - target||^2 with weight = sigma^2 (or g^2 under
  likelihood weighting); sum-over-dims x 0.5 when reduce_mean=False; batch
  mean.
* optimizer (``losses.py:12-49``): Adam/AdamW with linear LR warmup and
  global-norm gradient clipping, expressed as an optax chain (clip -> adam
  -> [decoupled wd] -> warmup-scaled lr), exactly the torch ordering.
* step functions (``losses.py:110-160``): grad + update + EMA in ONE jitted
  program.  The reference's per-step NaN-hook registration leak
  (``losses.py:98-104``, responsible for the 0.5 s -> 38 s/step decay in the
  reference logs) is intentionally NOT replicated; NaN detection is a free
  ``jnp.isnan(loss)`` flag returned from the step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from rdm_tpu.models import ema as ema_lib
from rdm_tpu.ops import cube
from .state import TrainState


def _bcast(v, x):
    return v.reshape(v.shape + (1,) * (x.ndim - v.ndim))


def get_optimizer(config):
    """optax equivalent of reference ``get_optimizer`` + ``optimization_manager``."""
    opt = config.optim
    lr = opt.lr
    warmup = opt.get("warmup", 0)

    def schedule(step):
        if warmup > 0:
            return lr * jnp.minimum(step / warmup, 1.0)
        return lr

    parts = []
    if opt.get("grad_clip", -1) >= 0:
        parts.append(optax.clip_by_global_norm(opt.grad_clip))
    parts.append(optax.scale_by_adam(b1=opt.beta1, b2=opt.beta2, eps=float(opt.eps)))
    name = opt.optimizer
    if name == "AdamW":
        parts.append(optax.add_decayed_weights(opt.weight_decay))
    elif name == "Adam":
        if opt.weight_decay:  # torch Adam applies L2 to grads pre-moments;
            # the reference always runs weight_decay=0, so keep it simple.
            parts.append(optax.add_decayed_weights(opt.weight_decay))
    else:
        raise NotImplementedError(f"Optimizer {name} not supported yet!")
    parts.append(optax.scale_by_schedule(lambda s: -schedule(s)))
    return optax.chain(*parts)


#: remat policies for the score-model forward inside the training loss.
#: Offered because the step profile looks remat-friendly (~33 TF/s of
#: the chip's 197 vs ~550 GB/s of its 819 at batch 4096), but the
#: interleaved A/B on v5e measured recompute LOSING: none 61 ms/step,
#: dots 71 ms, full 78 ms — at 9x9 spatial dims the saved activations
#: are tiny and XLA's schedule already overlaps their HBM traffic
#: (BENCH_NOTES.md "remat study").  The knob stays for memory-
#: constrained deployments (larger models/batches on smaller chips);
#: gradients match across policies (recompute replays the same ops;
#: differences only from fusion reassociation, <= 1e-11 on f32).
_REMAT_POLICIES = {
    "none": None,
    "dots": jax.checkpoint_policies.checkpoint_dots,
    "full": jax.checkpoint_policies.nothing_saveable,
}


def get_loss_fn(sde, model, train: bool, reduce_mean: bool = True,
                likelihood_weighting: bool = True, eps: float = 1e-5,
                remat: str = "none"):
    """Returns ``loss_fn(params, batch, class_labels, rng) -> scalar``.

    ``loss_fn`` accepts optional keyword overrides ``t``/``z`` replacing
    the in-step draws — used by the cross-framework training-dynamics
    parity test to feed the exact noise sequence the reference's torch
    loss drew (``losses.py:80-81``) into this step.
    """
    policy = _REMAT_POLICIES[remat]

    def apply_fn(params, perturbed, time_cond, class_labels, rngs):
        return model.apply({"params": params}, perturbed, time_cond,
                           class_labels=class_labels, train=train, rngs=rngs)

    if policy is not None and train:
        apply_fn = jax.checkpoint(apply_fn, policy=policy)

    def loss_fn(params, batch, class_labels, rng, t=None, z=None):
        kt, kz, kd, kc = jax.random.split(rng, 4)
        B = batch.shape[0]
        if t is None:
            t = jax.random.uniform(kt, (B,), batch.dtype, eps, sde.T)
        if z is None:
            z = jax.random.normal(kz, batch.shape, batch.dtype)
        mean, std = sde.marginal_prob(batch, t)
        perturbed = cube.reflect(mean + _bcast(std, batch) * z)

        _, time_cond = sde.marginal_prob(jnp.zeros_like(batch), t)
        rngs = {"dropout": kd, "cond_drop": kc} if train else None
        score = apply_fn(params, perturbed, time_cond, class_labels, rngs)
        target = cube.score_hk(perturbed, mean, std)

        if likelihood_weighting:
            _, g = sde.sde(jnp.zeros_like(batch), t)
            weight = g**2
        else:
            weight = std**2
        sq = _bcast(weight, batch) * (score - target) ** 2
        sq = sq.reshape(B, -1)
        per_sample = jnp.mean(sq, -1) if reduce_mean else 0.5 * jnp.sum(sq, -1)
        return jnp.mean(per_sample)

    return loss_fn


def _guarded_update(state: TrainState, loss, grads, tx):
    """optax update + EMA, SKIPPED entirely when the loss or any gradient
    is non-finite: the parameters, optimiser state, and EMA carry over
    unchanged and only the step counter advances.

    The reference merely *warns* on NaN losses/grads (per-parameter hooks,
    ``losses.py:95-104``) and lets the update through — one bad batch then
    poisons the parameters for the rest of the run (observed once in ~30k
    bf16 steps).  Skipping is the production-grade behaviour and is free:
    a ``jnp.where`` select on the update trees, no host sync.
    """
    finite = jnp.isfinite(loss)
    for leaf in jax.tree_util.tree_leaves(grads):
        finite &= jnp.all(jnp.isfinite(leaf))

    safe_grads = jax.tree_util.tree_map(
        lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
    updates, opt_state = tx.update(safe_grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    params = jax.tree_util.tree_map(
        lambda new, old: jnp.where(finite, new, old), params, state.params)
    opt_state = jax.tree_util.tree_map(
        lambda new, old: jnp.where(finite, new, old),
        opt_state, state.opt_state)
    ema = ema_lib.update(state.ema, params)
    ema = jax.tree_util.tree_map(
        lambda new, old: jnp.where(finite, new, old), ema, state.ema)
    return TrainState(step=state.step + 1, params=params,
                      opt_state=opt_state, ema=ema)


def make_train_step(sde, model, tx, reduce_mean=False, likelihood_weighting=False,
                    remat="none"):
    """One fused training step: value_and_grad -> optax update -> EMA.
    jit (optionally with shardings) is applied by the caller."""
    loss_fn = get_loss_fn(sde, model, train=True, reduce_mean=reduce_mean,
                          likelihood_weighting=likelihood_weighting, remat=remat)

    def step_fn(state: TrainState, batch, class_labels, rng, t=None, z=None):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch,
                                                  class_labels, rng, t=t, z=z)
        return _guarded_update(state, loss, grads, tx), loss

    return step_fn


def make_train_step_on_device(sde, model, tx, use_labels: bool,
                              reduce_mean=False, likelihood_weighting=False,
                              batch_size: int | None = None, remat="none"):
    """Train step with a DEVICE-RESIDENT dataset: the whole (replicated)
    dataset is a step argument and the minibatch is gathered on-device —
    the north star's "pkl -> pad -> reshape as on-device gather"
    (SURVEY.md section 7.3).

    Two index modes:
      * ``batch_size=None``: ``step(state, images, labels, idx, rng)`` —
        caller supplies the [B] index vector (exact epoch shuffles), which
        costs one small host upload per step;
      * ``batch_size=B``: ``step(state, images, labels, rng)`` — indices
        are drawn on-device from the step key (uniform WITH replacement, a
        minor documented divergence from the reference's epoch shuffle).
        Nothing but the PRNG key crosses the host boundary, which matters
        on remote-attached chips where any upload is a synchronous ~90 ms
        round trip.
    """
    loss_fn = get_loss_fn(sde, model, train=True, reduce_mean=reduce_mean,
                          likelihood_weighting=likelihood_weighting, remat=remat)

    def _body(state: TrainState, images, labels, idx, rng):
        batch = jnp.take(images, idx, axis=0)
        class_labels = jnp.take(labels, idx, axis=0) if use_labels else None
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch,
                                                  class_labels, rng)
        return _guarded_update(state, loss, grads, tx), loss

    if batch_size is None:
        return _body

    def step_fn(state: TrainState, images, labels, rng):
        rng, k_idx = jax.random.split(rng)
        idx = jax.random.randint(k_idx, (batch_size,), 0, images.shape[0])
        return _body(state, images, labels, idx, rng)

    return step_fn


def make_eval_step(sde, model, reduce_mean=False, likelihood_weighting=False):
    """Evaluation loss under the EMA parameters (reference ``losses.py:150-156``
    swaps EMA weights in under no_grad; functionally we just read the shadow
    tree)."""
    loss_fn = get_loss_fn(sde, model, train=False, reduce_mean=reduce_mean,
                          likelihood_weighting=likelihood_weighting)

    def eval_fn(state: TrainState, batch, class_labels, rng):
        return loss_fn(state.ema.shadow_params, batch, class_labels, rng)

    return eval_fn
