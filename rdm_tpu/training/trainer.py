"""Training driver (reference ``run_train.py:52-282``), TPU-native.

One process drives all local TPU chips through a DP mesh — there is no
mp.spawn / NCCL process-group dance (SURVEY.md 2.8): ``pjit`` + XLA
collectives replace DDP, per-host data sharding replaces
DistributedSampler, and program order replaces ``dist.barrier``.

Operational parity with the reference loop:
  * work dir layout ``samples/ checkpoints/ checkpoints-meta/checkpoint.pth``;
  * ``step: N, training_loss: X`` / ``evaluation_loss`` log lines every
    ``log_freq`` / ``eval_freq`` (Telemetry parsers key on the format);
  * rolling preemption checkpoint every ``snapshot_freq_for_preemption``;
  * snapshot checkpoint + EMA-swapped sampling every ``snapshot_freq``,
    samples saved as ``samples/iter_{step}/sample_0.npy`` (+ .png grid);
  * resume from ``checkpoint_path`` override or the meta checkpoint.

Fixed (not replicated) reference defects: per-step gc/empty_cache
(``run_train.py:136-137``) and the NaN-hook leak (see losses.py).
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from rdm_tpu import config as config_lib
from rdm_tpu.data import get_dataset, load_arrays
from rdm_tpu.models import create_model
from rdm_tpu.models.registry import get_cf_score_fn, get_score_fn
from rdm_tpu.parallel import (jit_eval_step, jit_train_step,
                              jit_train_step_on_device, make_mesh,
                              replicated, shard_host_batch)
from rdm_tpu.sampling import get_sampling_fn
from rdm_tpu.sde import get_sde
from rdm_tpu.utils import get_logger, makedirs
from . import checkpoints
from .losses import (get_optimizer, make_eval_step, make_train_step,
                     make_train_step_on_device)
from .state import init_train_state

SAMPLING_EPS = 1e-5  # reference run_train.py:105


class _StallWatchdog:
    """Kill the process when the training loop stops making progress.

    A hung device call on a remote/tunnelled accelerator never returns
    and never raises, so no in-process recovery exists: the ONLY way to
    resume is process death + restart from the rolling meta checkpoint
    (which ``run`` already restores by default).  Observed in production:
    the tunnelled TPU stalled twice during one 100k-step run, freezing
    the loop mid-step for 30+ minutes each time.

    Enable with ``training.stall_timeout_s`` (0 = off).  The watchdog
    exits with status 17 so a supervising loop (``launch/
    train_with_resume.sh``) can distinguish a stall from a crash.
    """

    EXIT_CODE = 17

    def __init__(self, timeout_s: float, logger):
        import threading

        self.timeout_s = timeout_s
        self._logger = logger
        self._beat = time.time()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._watch, daemon=True)
        self._thread.start()

    def beat(self):
        self._beat = time.time()

    def stop(self):
        self._stop.set()

    def _watch(self):
        while not self._stop.wait(min(30.0, self.timeout_s / 4)):
            stalled = time.time() - self._beat
            if stalled > self.timeout_s:
                self._logger.error(
                    "STALL WATCHDOG: no training progress for %.0f s "
                    "(device call hung?); exiting %d for supervised "
                    "restart from the meta checkpoint.",
                    stalled, self.EXIT_CODE)
                for h in self._logger.handlers:
                    h.flush()
                os._exit(self.EXIT_CODE)


def run(cfg, work_dir: str, checkpoint_path: str | None = None) -> None:
    sample_dir = os.path.join(work_dir, "samples")
    checkpoint_dir = os.path.join(work_dir, "checkpoints")
    checkpoint_meta = os.path.join(work_dir, "checkpoints-meta", "checkpoint.pth")
    restore_path = checkpoint_path if checkpoint_path else checkpoint_meta
    for d in (sample_dir, checkpoint_dir, os.path.dirname(checkpoint_meta)):
        makedirs(d)
    logger = get_logger(os.path.join(work_dir, "logs"))
    mprint = logger.info

    mesh = make_mesh()
    mprint(f"mesh: {mesh} devices: {jax.devices()}")

    model = create_model(cfg)
    sde = get_sde(cfg)
    tx = get_optimizer(cfg)
    state = init_train_state(model, tx, cfg, rng=jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    mprint(f"model: {cfg.model.name} ({n_params:,} params), sde: RVESDE("
           f"{cfg.sde.sigma_min}, {cfg.sde.sigma_max}, N={cfg.sde.num_scales})")

    state = checkpoints.restore_checkpoint(restore_path, state,
                                           model_name=cfg.model.name)
    initial_step = int(state.step)
    state = jax.device_put(state, replicated(mesh))

    train_iter, eval_iter = get_dataset(cfg)
    classes = bool(cfg.data.get("classes", False))

    # On-device dataset path (single-process): keep the whole dataset
    # replicated on the mesh and gather minibatches on-device — only a [B]
    # index vector crosses the host boundary per step (8x faster on the
    # tunnelled v5e, and the north star's on-device pkl pipeline).
    device_data = None
    if (cfg.training.get("data_on_device", True)
            and cfg.data.dataset in ("GTOHaloImage", "GTOHalo")
            and jax.process_count() == 1):
        imgs_np, lbls_np = load_arrays(cfg)
        if imgs_np.nbytes + lbls_np.nbytes < 2 << 30:
            device_data = (
                jax.device_put(jnp.asarray(imgs_np), replicated(mesh)),
                jax.device_put(jnp.asarray(lbls_np), replicated(mesh)),
                lbls_np,
            )
            mprint(f"dataset resident on device "
                   f"({(imgs_np.nbytes + lbls_np.nbytes) / 1e6:.1f} MB)")

    remat = cfg.training.get("remat", "none")
    if device_data is not None:
        train_step = jit_train_step_on_device(make_train_step_on_device(
            sde, model, tx, use_labels=classes,
            reduce_mean=cfg.training.reduce_mean,
            likelihood_weighting=cfg.training.likelihood_weighting,
            batch_size=cfg.training.batch_size, remat=remat), mesh)
    else:
        train_step = jit_train_step(make_train_step(
            sde, model, tx, reduce_mean=cfg.training.reduce_mean,
            likelihood_weighting=cfg.training.likelihood_weighting,
            remat=remat), mesh)
    eval_step = jit_eval_step(make_eval_step(
        sde, model, reduce_mean=cfg.training.reduce_mean,
        likelihood_weighting=cfg.training.likelihood_weighting), mesh)

    # Snapshot sampling: EMA params + CFG (reference run_train.py:168-190).
    if cfg.training.snapshot_sampling:
        sampling_shape = (cfg.training.batch_size,
                          cfg.data.image_size,
                          cfg.data.get("image_width", cfg.data.image_size),
                          cfg.data.num_channels)
        sampling_fn = get_sampling_fn(cfg, sde, sampling_shape, SAMPLING_EPS)

        def snapshot_sample(params, key):
            kw, kl, ks = jax.random.split(key, 3)
            labels = jnp.zeros((sampling_shape[0], cfg.model.get("num_classes", 1)))
            if classes:
                weight = 4.0 * jax.random.uniform(kw, (sampling_shape[0],))
                score_fn = get_cf_score_fn(sde, model, params, labels, weight)
            else:
                score_fn = lambda x, t: get_score_fn(sde, model, params)(x, t)
            return sampling_fn(score_fn, ks)[0]

        snapshot_sample = jax.jit(snapshot_sample)

    num_train_steps = cfg.training.n_iters
    mprint(f"Starting training loop at step {initial_step}.")
    # Per-step randomness (t, z, dropout, cond-drop) defaults to the
    # hardware-RNG-backed "rbg" implementation: threefry bit generation
    # is pure VPU work and costs a measured 12% of the training step
    # (59.2 -> 52.2 ms at batch 4096 bf16; BENCH_NOTES "training-step
    # decomposition").  Training draws carry no golden/bit-parity
    # contract — set training.prng_impl=threefry2x32 to reproduce runs
    # recorded under the JAX default.
    prng_impl = cfg.training.get("prng_impl", "rbg")
    rng = jax.random.key(cfg.get("seed", 42), impl=prng_impl)
    rng = jax.random.fold_in(rng, jax.process_index())

    stall_timeout = float(cfg.training.get("stall_timeout_s", 0) or 0)
    watchdog = (_StallWatchdog(stall_timeout, logger)
                if stall_timeout > 0 else None)

    first = True
    t_last = time.time()
    for step in range(initial_step, num_train_steps + 1):
        if watchdog is not None:
            watchdog.beat()
        rng, k = jax.random.split(rng)
        if device_data is not None:
            d_imgs, d_lbls, lbls_np = device_data
            if first:
                mprint(f"TRAINING: First batch class labels: "
                       f"{lbls_np[:10].ravel()} (on-device sampling)")
                first = False
            state, loss = train_step(state, d_imgs, d_lbls, k)
        else:
            imgs, labels = next(train_iter)
            gb, gl = shard_host_batch(mesh, (jnp.asarray(imgs), jnp.asarray(labels)))
            if first:
                mprint(f"TRAINING: First batch class labels: {np.asarray(labels[:10]).ravel()}")
                first = False
            state, loss = train_step(state, gb, gl if classes else None, k)

        if step % cfg.training.log_freq == 0:
            mprint("step: %d, training_loss: %.5e" % (step, float(loss)))

        if step != 0 and step % cfg.training.snapshot_freq_for_preemption == 0 \
                and jax.process_index() == 0:
            checkpoints.save_checkpoint(checkpoint_meta, jax.device_get(state),
                                        config=cfg, model_name=cfg.model.name)

        if step % cfg.training.eval_freq == 0:
            eimgs, elabels = next(eval_iter)
            geb, gel = shard_host_batch(mesh, (jnp.asarray(eimgs), jnp.asarray(elabels)))
            rng, k = jax.random.split(rng)
            eval_loss = eval_step(state, geb, gel if classes else None, k)
            mprint("step: %d, evaluation_loss: %.5e" % (step, float(eval_loss)))

        if (step != 0 and step % cfg.training.snapshot_freq == 0) or step == num_train_steps:
            save_step = step // cfg.training.snapshot_freq
            if jax.process_index() == 0:
                checkpoints.save_checkpoint(
                    os.path.join(checkpoint_dir, f"checkpoint_{save_step}.pth"),
                    jax.device_get(state), config=cfg, model_name=cfg.model.name)
            if cfg.training.snapshot_sampling:
                mprint(f"Generating samples at step: {step}")
                rng, k = jax.random.split(rng)
                sample = np.asarray(snapshot_sample(state.ema.shadow_params, k))
                this_dir = os.path.join(sample_dir, f"iter_{step}")
                makedirs(this_dir)
                np.save(os.path.join(this_dir, f"sample_{jax.process_index()}"),
                        np.clip(np.round(sample * 255), 0, 255).astype(np.uint8))
                _save_grid(sample, os.path.join(
                    this_dir, f"sample_{jax.process_index()}.png"))
            dt = time.time() - t_last
            mprint(f"snapshot at step {step} done ({dt:.1f}s since last)")
            t_last = time.time()

    if watchdog is not None:
        watchdog.stop()


def _save_grid(sample: np.ndarray, path: str, max_tiles: int = 64) -> None:
    """Save a PNG grid of samples (torchvision make_grid equivalent)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    n = min(sample.shape[0], max_tiles)
    nrow = int(np.sqrt(n)) or 1
    ncol = -(-n // nrow)
    fig, axes = plt.subplots(nrow, ncol, figsize=(ncol, nrow))
    axes = np.atleast_1d(axes).ravel()
    for i, ax in enumerate(axes):
        ax.axis("off")
        if i < n:
            ax.imshow(sample[i, :, :, 0], cmap="viridis", vmin=0, vmax=1)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
