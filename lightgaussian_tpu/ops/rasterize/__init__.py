from lightgaussian_tpu.ops.rasterize.api import (  # noqa: F401
    RenderOutput,
    count_render,
    default_max_instances,
    render,
)
