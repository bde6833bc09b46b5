from .count import sharded_count, make_mesh  # noqa: F401
