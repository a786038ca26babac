from cigwas_tpu.skeleton.cupc import (
    SkeletonResult,
    skeleton,
    hetcor_skeleton,
)
from cigwas_tpu.skeleton.reduce import (
    subset_variables,
    reduce_gcs,
    reduce_gc,
)

__all__ = [
    "SkeletonResult",
    "skeleton",
    "hetcor_skeleton",
    "subset_variables",
    "reduce_gcs",
    "reduce_gc",
]
