from . import scancontext, detector  # noqa: F401
