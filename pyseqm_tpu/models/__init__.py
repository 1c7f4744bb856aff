from .energy import SEQMConfig, energy, force  # noqa: F401
