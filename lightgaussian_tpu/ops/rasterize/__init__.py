from lightgaussian_tpu.ops.rasterize.api import (  # noqa: F401
    RenderOutput,
    build_binning,
    count_render,
    default_max_instances,
    render,
)
