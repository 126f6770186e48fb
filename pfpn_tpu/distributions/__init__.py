from . import categorical, gaussian, particle  # noqa: F401
