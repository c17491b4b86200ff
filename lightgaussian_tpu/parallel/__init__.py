from lightgaussian_tpu.parallel.mesh import make_mesh, DATA_AXIS, SPACE_AXIS
from lightgaussian_tpu.parallel.train import (
    make_parallel_train_step,
    stack_cameras,
)
from lightgaussian_tpu.parallel.gauss import (
    GAUSS_AXIS,
    gather_state,
    make_gauss_mesh,
    make_gauss_train_step,
    shard_state,
)
from lightgaussian_tpu.parallel.gss import (
    accumulate_gss_sharded,
    make_accumulate_gss_sharded,
    pad_cameras,
)
from lightgaussian_tpu.parallel.render import (
    make_parallel_render,
    parallel_render,
)

__all__ = [
    "make_mesh",
    "DATA_AXIS",
    "SPACE_AXIS",
    "GAUSS_AXIS",
    "make_parallel_train_step",
    "make_gauss_mesh",
    "make_gauss_train_step",
    "shard_state",
    "gather_state",
    "stack_cameras",
    "accumulate_gss_sharded",
    "make_accumulate_gss_sharded",
    "pad_cameras",
    "make_parallel_render",
    "parallel_render",
]
