from . import pose_graph, schur  # noqa: F401
