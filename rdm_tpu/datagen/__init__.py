from .init_generator import CR3BPInitGenerator  # noqa: F401
from .prepare_training_data import prepare_training_data, get_halo_period  # noqa: F401
