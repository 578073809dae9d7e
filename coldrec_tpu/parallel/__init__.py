from .mesh import AXIS_DATA, AXIS_MODEL, make_mesh, table_sharding, batch_sharding

__all__ = [
    "AXIS_DATA",
    "AXIS_MODEL",
    "make_mesh",
    "table_sharding",
    "batch_sharding",
]
