from .registry import (register_model, get_model, create_model,  # noqa: F401
                       get_model_fn, get_score_fn, get_cf_score_fn)
from .ncsnpp import NCSNpp  # noqa: F401
from .unet1d import UNet1D  # noqa: F401
from .adm import WrappedADM  # noqa: F401
from .vdm import VDM  # noqa: F401
from . import ema  # noqa: F401
