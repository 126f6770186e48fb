from .ppo import PPO, PPOConfig, PPOState  # noqa: F401
from .a2c import A2C, A2CConfig  # noqa: F401
from .vtrace import VTrace, VTraceConfig  # noqa: F401
from .sac import SAC, SACConfig, SACState  # noqa: F401
from .recurrent import RecurrentPPO  # noqa: F401
from . import gae, replay  # noqa: F401
