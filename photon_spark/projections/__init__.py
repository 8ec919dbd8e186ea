from photon_spark.projections.engine import (
    AssociativeReducer,
    NativeReducer,
    Projection,
    ProjectionEngine,
    PyReducer,
)

__all__ = [
    "AssociativeReducer",
    "NativeReducer",
    "Projection",
    "ProjectionEngine",
    "PyReducer",
]
