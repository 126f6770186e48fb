from .types import KinematicTree, SimState, zero_state  # noqa: F401
from .urdf import load_urdf  # noqa: F401
from .engine import Engine, EngineConfig  # noqa: F401
from .contact import ContactParams  # noqa: F401
from . import dynamics  # noqa: F401
