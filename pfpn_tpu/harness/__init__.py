from .config import HeadSettings, NetworkSettings, RunConfig, WorkerSettings  # noqa: F401
from .settings import SETTINGS, build  # noqa: F401
