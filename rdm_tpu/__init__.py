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
