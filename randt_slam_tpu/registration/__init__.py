from . import barron, residuals, solver, matcher  # noqa: F401
