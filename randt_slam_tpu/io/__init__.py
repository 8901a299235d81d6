from . import synthetic, formats  # noqa: F401
