from lightgaussian_tpu.parallel.mesh import make_mesh, DATA_AXIS, SPACE_AXIS
from lightgaussian_tpu.parallel.train import (
    make_parallel_train_step,
    stack_cameras,
)

__all__ = [
    "make_mesh",
    "DATA_AXIS",
    "SPACE_AXIS",
    "make_parallel_train_step",
    "stack_cameras",
]
