"""rdm_tpu — TPU-native Reflected Diffusion framework.

A brand-new JAX/XLA/Pallas/pjit implementation of the capabilities of
``sriramelango/optimized-diffusion-model``: reflected variance-exploding
score-based diffusion on the unit hypercube for GTO->Halo low-thrust
trajectory generation, with a scan-compiled predictor-corrector sampler,
classifier-free guidance, data-parallel training over a TPU mesh, and the
reference's full evaluation surface (ML statistics + CR3BP physical
validation).

Layout (see SURVEY.md for the reference layer map this mirrors):
  ops/       pure-jnp + Pallas math core (cube reflection, heat-kernel score)
  sde/       forward/reverse SDE definitions (RVESDE)
  models/    Flax score networks (NCSN++, UNet1D, ...) + registry + EMA
  sampling/  PC / ODE samplers compiled as lax.scan
  training/  loss, optimizer chain, train step, trainer driver, checkpoints
  data/      dataset pipeline (GTO Halo pkl -> padded 9x9 "images")
  parallel/  mesh construction + sharding specs (DP over ICI)
  utils/     logging, config
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Point JAX at a persistent on-disk compilation cache.

    The physics oracle's LM solve (solver_tpu.py) is a large autodiff
    program whose XLA compile takes minutes; caching makes that a
    once-per-machine cost instead of once-per-process.  Respects an
    explicit JAX_COMPILATION_CACHE_DIR / jax.config setting if the user
    already chose one.

    The cache directory is scoped by a host fingerprint (jax version +
    CPU feature flags): XLA:CPU AOT entries do NOT key on the host ISA,
    so an entry compiled on one machine can be loaded on another with
    different vector units — observed to change f32 rounding enough that
    the chaotic CR3BP shoot diverges between a cached and a fresh
    executable of the same program (and XLA itself warns it "could lead
    to execution errors such as SIGILL")."""
    import hashlib
    import os
    import platform

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return
        finger = jax.__version__ + platform.machine()
        try:
            # flags alone are not enough: LLVM derives tuning features
            # (prefer-no-gather/scatter) from the CPU *model*, so two
            # hosts with identical flag lines can still produce
            # incompatible AOT entries.
            got = set()
            with open("/proc/cpuinfo") as f:
                for line in f:
                    key = line.split(":", 1)[0].strip()
                    if key in ("flags", "model name", "model", "cpu family") \
                            and key not in got:
                        got.add(key)
                        finger += line
                    if len(got) == 4:
                        break
        except OSError:
            finger += platform.processor()
        host = hashlib.sha1(finger.encode()).hexdigest()[:12]
        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             "rdm_tpu", "xla_cache", host)
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        # cache everything that took noticeable compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is an optimisation only
        pass


_enable_compilation_cache()
