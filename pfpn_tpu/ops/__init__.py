from .linalg import spd_inverse  # noqa: F401
