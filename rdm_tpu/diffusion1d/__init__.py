from .schedules import linear_beta_schedule, cosine_beta_schedule  # noqa: F401
from .gaussian_diffusion import GaussianDiffusion1D  # noqa: F401
