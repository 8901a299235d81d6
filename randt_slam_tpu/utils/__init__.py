from . import profiling, checkpoint  # noqa: F401
