from . import frontend, slam  # noqa: F401
