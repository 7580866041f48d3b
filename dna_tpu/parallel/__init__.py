from dna_tpu.parallel.mesh import (
    DEFAULT_RULES,
    MESH_AXES,
    batch_sharding,
    build_mesh,
    data_pspec,
    logical_rules,
    resolve_mesh_shape,
    single_device_mesh,
)

__all__ = [
    "DEFAULT_RULES",
    "MESH_AXES",
    "batch_sharding",
    "build_mesh",
    "data_pspec",
    "logical_rules",
    "resolve_mesh_shape",
    "single_device_mesh",
]
