from .mesh import make_mesh, render_iteration_sharded  # noqa: F401
