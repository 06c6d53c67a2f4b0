from . import checkpoint, metrics, policies, profiling  # noqa: F401
