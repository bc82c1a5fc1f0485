from .losses import get_loss_fn, get_optimizer, make_train_step, make_eval_step  # noqa: F401
from .state import TrainState, init_train_state  # noqa: F401
