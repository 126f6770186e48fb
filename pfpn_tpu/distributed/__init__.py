from .mesh import default_mesh, make_sharded_ppo  # noqa: F401
