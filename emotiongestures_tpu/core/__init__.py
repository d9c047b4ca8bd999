from . import init, layers, losses, schedules  # noqa: F401
