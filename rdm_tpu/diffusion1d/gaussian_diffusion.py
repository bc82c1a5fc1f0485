"""Gaussian DDPM on 1-D sequences — functional JAX rebuild of the legacy
``GaussianDiffusion1D`` (reference ``GTO_Halo_DM/DM_scripts/
classifier_free_guidance_cond_1d_improved_constrained_diffusion.py:601-1122``).

Capabilities (all semantics preserved):
  * cosine/linear beta schedules, f64-computed buffers;
  * objectives pred_noise / pred_x0 / pred_v with SNR loss weights;
  * ancestral ``p_sample_loop`` and ``ddim_sample`` — both as ONE
    ``lax.scan`` over timesteps (the reference pays a Python round trip per
    step);
  * ``q_sample`` / ``q_sample_many`` / ``interpolate``;
  * the constraint-violation-augmented training loss ``p_losses`` with
    loss types NA | one_over_t | gt_threshold | gt_scaled | gt_std |
    gt_std_absolute | gt_std_threshold | gt_log_likelihood, including the
    guided ``p_sample`` of x_{t-1} INSIDE the loss and the
    3-sigma / [-1,1] normalisation variants (``:918-1113``).

Constraint functions are pluggable: the reference hard-imports car /
tabletop constraint modules from an external package and leaves the cr3bp
branch empty (``:970-983``); here ``constraint_fn(x_flat, classes, scale)
-> [B]`` is injected, and omitting it restricts loss types to "NA"
(matching how the cr3bp task could actually run in the reference).

The model is a Flax module exposing ``__call__(x, t, classes,
cond_drop_prob)`` and ``forward_with_cond_scale`` (see
``rdm_tpu.models.unet1d``); x layout is (B, L, C).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import cosine_beta_schedule, linear_beta_schedule


class ModelPrediction(NamedTuple):
    pred_noise: jnp.ndarray
    pred_x_start: jnp.ndarray


def _extract(a, t, ndim):
    return a[t].reshape(t.shape[0], *((1,) * (ndim - 1)))


class GaussianDiffusion1D:
    def __init__(self, model, *, seq_length: int, timesteps: int = 1000,
                 sampling_timesteps: Optional[int] = None,
                 objective: str = "pred_noise", beta_schedule: str = "cosine",
                 ddim_sampling_eta: float = 0.0, auto_normalize: bool = True,
                 constraint_violation_weight: float = 0.001,
                 constraint_condscale: float = 6.0,
                 max_sample_step_with_constraint_loss: int = 500,
                 constraint_loss_type: str = "NA", task_type: str = "cr3bp",
                 constraint_gt_sample_num: int = 1,
                 normalize_xt_by_mean_sigma: str = "False",
                 constraint_fn: Optional[Callable] = None):
        assert objective in {"pred_noise", "pred_x0", "pred_v"}
        self.model = model
        self.channels = model.channels
        self.seq_length = seq_length
        self.objective = objective
        self.constraint_violation_weight = constraint_violation_weight
        self.constraint_condscale = constraint_condscale
        self.max_sample_step_with_constraint_loss = max_sample_step_with_constraint_loss
        self.constraint_loss_type = constraint_loss_type
        self.task_type = task_type
        self.constraint_gt_sample_num = constraint_gt_sample_num
        self.normalize_xt_by_mean_sigma = normalize_xt_by_mean_sigma
        self.constraint_fn = constraint_fn
        if constraint_loss_type != "NA" and constraint_fn is None:
            raise ValueError(
                f"constraint_loss_type={constraint_loss_type!r} needs a "
                "constraint_fn (the reference's car/tabletop constraint "
                "modules are external; cr3bp has no constraint function)")

        betas64 = (linear_beta_schedule(timesteps) if beta_schedule == "linear"
                   else cosine_beta_schedule(timesteps))
        alphas = 1.0 - betas64
        ac = np.cumprod(alphas)
        ac_prev = np.concatenate([[1.0], ac[:-1]])
        self.num_timesteps = int(timesteps)
        self.sampling_timesteps = sampling_timesteps or timesteps
        assert self.sampling_timesteps <= timesteps
        self.is_ddim_sampling = self.sampling_timesteps < timesteps
        self.ddim_sampling_eta = ddim_sampling_eta

        f32 = lambda v: jnp.asarray(v, jnp.float32)
        self.betas = f32(betas64)
        self.alphas_cumprod = f32(ac)
        self.alphas_cumprod_prev = f32(ac_prev)
        self.sqrt_alphas_cumprod = f32(np.sqrt(ac))
        self.sqrt_one_minus_alphas_cumprod = f32(np.sqrt(1 - ac))
        self.log_one_minus_alphas_cumprod = f32(np.log(1 - ac))
        self.sqrt_recip_alphas_cumprod = f32(np.sqrt(1 / ac))
        self.sqrt_recipm1_alphas_cumprod = f32(np.sqrt(1 / ac - 1))
        post_var = betas64 * (1 - ac_prev) / (1 - ac)
        self.posterior_variance = f32(post_var)
        self.posterior_log_variance_clipped = f32(np.log(np.clip(post_var, 1e-20, None)))
        self.posterior_mean_coef1 = f32(betas64 * np.sqrt(ac_prev) / (1 - ac))
        self.posterior_mean_coef2 = f32((1 - ac_prev) * np.sqrt(alphas) / (1 - ac))
        snr = ac / (1 - ac)
        self.loss_weight = f32({"pred_noise": np.ones_like(snr),
                                "pred_x0": snr,
                                "pred_v": snr / (snr + 1)}[objective])
        self.auto_normalize = auto_normalize

    # -- normalisation [0,1] <-> [-1,1] (reference ``:699-700``) ----------
    def normalize(self, x):
        return x * 2 - 1 if self.auto_normalize else x

    def unnormalize(self, x):
        return (x + 1) * 0.5 if self.auto_normalize else x

    # -- closed-form conversions (reference ``:703-735``) -----------------
    def predict_start_from_noise(self, x_t, t, noise):
        nd = x_t.ndim
        return (_extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
                - _extract(self.sqrt_recipm1_alphas_cumprod, t, nd) * noise)

    def predict_noise_from_start(self, x_t, t, x0):
        nd = x_t.ndim
        return ((_extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t - x0)
                / _extract(self.sqrt_recipm1_alphas_cumprod, t, nd))

    def predict_v(self, x_start, t, noise):
        nd = x_start.ndim
        return (_extract(self.sqrt_alphas_cumprod, t, nd) * noise
                - _extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * x_start)

    def predict_start_from_v(self, x_t, t, v):
        nd = x_t.ndim
        return (_extract(self.sqrt_alphas_cumprod, t, nd) * x_t
                - _extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * v)

    def q_posterior(self, x_start, x_t, t):
        nd = x_t.ndim
        mean = (_extract(self.posterior_mean_coef1, t, nd) * x_start
                + _extract(self.posterior_mean_coef2, t, nd) * x_t)
        var = _extract(self.posterior_variance, t, nd)
        logvar = _extract(self.posterior_log_variance_clipped, t, nd)
        return mean, var, logvar

    # -- model wrappers ----------------------------------------------------
    def model_predictions(self, params, x, t, classes, cond_scale=6.0,
                          rescaled_phi=0.7, clip_x_start=False,
                          rederive_pred_noise=False):
        out = self.model.forward_with_cond_scale(
            params, x, t.astype(jnp.float32), classes,
            cond_scale=cond_scale, rescaled_phi=rescaled_phi)
        clip = (lambda v: jnp.clip(v, -1.0, 1.0)) if clip_x_start else (lambda v: v)
        if self.objective == "pred_noise":
            pred_noise = out
            x_start = clip(self.predict_start_from_noise(x, t, pred_noise))
            if clip_x_start and rederive_pred_noise:
                pred_noise = self.predict_noise_from_start(x, t, x_start)
        elif self.objective == "pred_x0":
            x_start = clip(out)
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        else:  # pred_v
            x_start = clip(self.predict_start_from_v(x, t, out))
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        return ModelPrediction(pred_noise, x_start)

    def p_mean_variance(self, params, x, t, classes, cond_scale, rescaled_phi,
                        clip_denoised=True):
        preds = self.model_predictions(params, x, t, classes, cond_scale, rescaled_phi)
        x_start = jnp.clip(preds.pred_x_start, -1.0, 1.0) if clip_denoised \
            else preds.pred_x_start
        mean, var, logvar = self.q_posterior(x_start, x, t)
        return mean, var, logvar, x_start

    def p_sample(self, params, key, x, t, classes, cond_scale=6.0,
                 rescaled_phi=0.7, clip_denoised=True):
        """One ancestral step x_t -> x_{t-1}; ``t`` is a [B] int array."""
        mean, _, logvar, x_start = self.p_mean_variance(
            params, x, t, classes, cond_scale, rescaled_phi, clip_denoised)
        noise = jax.random.normal(key, x.shape, x.dtype)
        nonzero = (t > 0).reshape(-1, *((1,) * (x.ndim - 1)))
        img = mean + jnp.exp(0.5 * logvar) * noise * nonzero
        return img, x_start

    def p_sample_loop(self, params, key, classes, shape, cond_scale=6.0,
                      rescaled_phi=0.7, z=None):
        """Full ancestral chain as one lax.scan (reference ``:799-814``)."""
        k_init, k_scan = jax.random.split(key)
        img = jax.random.normal(k_init, shape) if z is None else z
        ts = jnp.arange(self.num_timesteps - 1, -1, -1)

        def body(carry, t):
            img, key = carry
            key, k = jax.random.split(key)
            tb = jnp.full((shape[0],), t, jnp.int32)
            img, _ = self.p_sample(params, k, img, tb, classes,
                                   cond_scale, rescaled_phi)
            return (img, key), None

        (img, _), _ = jax.lax.scan(body, (img, k_scan), ts)
        return self.unnormalize(img)

    def ddim_sample(self, params, key, classes, shape, cond_scale=6.0,
                    rescaled_phi=0.7, clip_denoised=True, z=None):
        """DDIM (reference ``:817-851``) as one lax.scan."""
        total, S, eta = self.num_timesteps, self.sampling_timesteps, self.ddim_sampling_eta
        times = np.linspace(-1, total - 1, S + 1).astype(int)[::-1]
        pairs = jnp.asarray(np.stack([times[:-1], times[1:]], 1))

        k_init, k_scan = jax.random.split(key)
        img = jax.random.normal(k_init, shape) if z is None else z

        def body(carry, pair):
            img, key = carry
            key, k = jax.random.split(key)
            time, time_next = pair[0], pair[1]
            tb = jnp.full((shape[0],), time, jnp.int32)
            pred_noise, x_start = self.model_predictions(
                params, img, tb, classes, cond_scale=cond_scale,
                clip_x_start=clip_denoised)
            alpha = self.alphas_cumprod[time]
            alpha_next = jnp.where(time_next < 0, 1.0,
                                   self.alphas_cumprod[jnp.maximum(time_next, 0)])
            sigma = eta * jnp.sqrt((1 - alpha / alpha_next) * (1 - alpha_next)
                                   / (1 - alpha))
            c = jnp.sqrt(jnp.clip(1 - alpha_next - sigma**2, 0.0, None))
            noise = jax.random.normal(k, img.shape, img.dtype)
            nxt = x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
            img = jnp.where(time_next < 0, x_start, nxt)
            return (img, key), None

        (img, _), _ = jax.lax.scan(body, (img, k_scan), pairs)
        return self.unnormalize(img)

    def sample(self, params, key, classes, cond_scale=6.0, rescaled_phi=0.7):
        shape = (classes.shape[0], self.seq_length, self.channels)
        fn = self.ddim_sample if self.is_ddim_sampling else self.p_sample_loop
        return fn(params, key, classes, shape, cond_scale, rescaled_phi)

    def interpolate(self, params, key, x1, x2, classes, t=None, lam=0.5,
                    cond_scale=6.0, rescaled_phi=0.7):
        """Latent interpolation (reference ``:860-877``)."""
        t = self.num_timesteps - 1 if t is None else t
        k1, k2, k_scan = jax.random.split(key, 3)
        tb = jnp.full((x1.shape[0],), t, jnp.int32)
        xt1 = self.q_sample(x1, tb, jax.random.normal(k1, x1.shape))
        xt2 = self.q_sample(x2, tb, jax.random.normal(k2, x2.shape))
        img = (1 - lam) * xt1 + lam * xt2

        def body(carry, i):
            img, key = carry
            key, k = jax.random.split(key)
            ib = jnp.full((x1.shape[0],), i, jnp.int32)
            img, _ = self.p_sample(params, k, img, ib, classes,
                                   cond_scale, rescaled_phi)
            return (img, key), None

        (img, _), _ = jax.lax.scan(body, (img, k_scan),
                                   jnp.arange(t - 1, -1, -1))
        return img

    # -- forward process ----------------------------------------------------
    def q_sample(self, x_start, t, noise):
        nd = x_start.ndim
        return (_extract(self.sqrt_alphas_cumprod, t, nd) * x_start
                + _extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise)

    def q_sample_many(self, key, x_start, t, sample_num):
        """[B, L, C, S] of q(x_t) draws; t==-1 clamps to 0 (reference
        ``:888-916``)."""
        t = jnp.where(t == -1, 0, t)
        noise = jax.random.normal(key, (*x_start.shape, sample_num), x_start.dtype)
        nd = x_start.ndim
        a = _extract(self.sqrt_alphas_cumprod, t, nd)[..., None]
        b = _extract(self.sqrt_one_minus_alphas_cumprod, t, nd)[..., None]
        return a * x_start[..., None] + b * noise

    # -- training loss -------------------------------------------------------
    def p_losses(self, params, key, x_start, t, classes, rngs=None, noise=None):
        """Reference ``:918-1113``; x_start already in [-1, 1]."""
        k_noise, k_ps, k_gt = jax.random.split(key, 3)
        if noise is None:
            noise = jax.random.normal(k_noise, x_start.shape, x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)

        model_out = self.model.apply(
            {"params": params}, x_t, t.astype(jnp.float32), classes,
            rngs=rngs)  # training forward uses the model's cond_drop_prob

        target = {"pred_noise": noise, "pred_x0": x_start,
                  "pred_v": self.predict_v(x_start, t, noise)}[self.objective]

        mse = jnp.mean((model_out - target) ** 2, axis=tuple(range(1, x_start.ndim)))
        mse = mse * self.loss_weight[t]
        base_loss = jnp.mean(mse)

        if self.constraint_loss_type == "NA":
            return base_loss

        # guided sample of x_{t-1} inside the loss (reference ``:946-949``)
        x_t_1, _ = self.p_sample(params, k_ps, x_t, t, classes,
                                 self.constraint_condscale, 0.7)
        safe_t1 = jnp.where(t - 1 == -1, 0, t - 1)
        nd = x_start.ndim
        mean_t1 = _extract(self.sqrt_alphas_cumprod, safe_t1, nd) * x_start
        sigma_t1 = _extract(self.sqrt_one_minus_alphas_cumprod, safe_t1, nd)
        lo, hi = mean_t1 - 3 * sigma_t1, mean_t1 + 3 * sigma_t1
        if self.normalize_xt_by_mean_sigma == "True":
            x01 = jnp.clip((x_t_1 - lo) / (hi - lo), 0.0, 1.0)
        else:
            x01 = (jnp.clip(x_t_1, -1.0, 1.0) + 1.0) / 2.0

        B = x_start.shape[0]
        if self.constraint_loss_type == "one_over_t":
            viol = self.constraint_fn(x01.reshape(B, -1), classes, 1.0 / (t + 1))
        else:
            S = self.constraint_gt_sample_num
            gt = self.q_sample_many(k_gt, x_start, t - 1, S)  # [B, L, C, S]
            if self.normalize_xt_by_mean_sigma == "True":
                gt01 = jnp.clip((gt - lo[..., None]) / (hi - lo)[..., None], 0.0, 1.0)
            else:
                gt01 = (jnp.clip(gt, -1.0, 1.0) + 1.0) / 2.0
            gt_flat = jnp.moveaxis(gt01, -1, 1).reshape(B * S, -1)
            classes_rep = jnp.repeat(classes, S, axis=0)
            gt_viol = self.constraint_fn(gt_flat, classes_rep, 1.0).reshape(B, S)
            gt_mean = jnp.mean(gt_viol, axis=1)
            gt_std = jnp.std(gt_viol, axis=1, ddof=1) if S > 1 else jnp.ones((B,))
            nn_viol = self.constraint_fn(x01.reshape(B, -1), classes, 1.0)

            clt = self.constraint_loss_type
            if clt == "gt_threshold":
                viol = jnp.maximum(nn_viol - gt_mean, 0.0)
            elif clt == "gt_scaled":
                viol = nn_viol / gt_mean
            elif clt == "gt_std":
                viol = (nn_viol - gt_mean) / gt_std
            elif clt == "gt_std_absolute":
                viol = jnp.abs(nn_viol - gt_mean) / gt_std
            elif clt == "gt_std_threshold":
                viol = jnp.maximum(nn_viol - gt_mean, 0.0) / gt_std
            elif clt == "gt_log_likelihood":
                viol = jnp.square((nn_viol - gt_mean) / gt_std)
            else:
                raise ValueError(f"wrong constraint_loss_type {clt}")

        mask = (t <= self.max_sample_step_with_constraint_loss).astype(viol.dtype)
        return base_loss + self.constraint_violation_weight * jnp.mean(viol * mask)

    def __call__(self, params, key, img, classes, rngs=None):
        """Training objective: uniform t, normalise [0,1] -> [-1,1], p_losses
        (reference ``:1115-1121``)."""
        assert img.shape[1] == self.seq_length, \
            f"seq length must be {self.seq_length}"
        k_t, k_loss = jax.random.split(key)
        t = jax.random.randint(k_t, (img.shape[0],), 0, self.num_timesteps)
        return self.p_losses(params, k_loss, self.normalize(img), t, classes,
                             rngs=rngs)
