from .actor_critic import ACConfig, ActorCritic  # noqa: F401
from .recurrent_ac import RecurrentACConfig, RecurrentActorCritic  # noqa: F401
from .heads import CategoricalHead, GaussianHead, ParticleHead  # noqa: F401
from . import normalizer  # noqa: F401
from .resample import maybe_resample, resample  # noqa: F401
