from . import cube  # noqa: F401
from .resize import nearest_resize, upsample2x_nearest  # noqa: F401
