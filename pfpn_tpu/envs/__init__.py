from . import assets  # noqa: F401
from .gym_adapter import Box, Env, GymEnv  # noqa: F401
from .multitask import MultiTaskEnv, make_multitask  # noqa: F401
