from . import mesh, batch  # noqa: F401
