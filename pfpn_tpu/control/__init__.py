from .spd import SPDGains, build_gains, spd_torques  # noqa: F401
