from . import planners  # noqa: F401
