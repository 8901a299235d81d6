from . import raytrace, ogm  # noqa: F401
