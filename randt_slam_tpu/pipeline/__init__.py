from . import frontend, slam, online  # noqa: F401
