from . import quaternion  # noqa: F401
from .filters import so_fb_butter_lpf  # noqa: F401
