from . import cells, grid, divergence  # noqa: F401
