from lightgaussian_tpu.ops.rasterize.api import render, count_render, RenderOutput  # noqa: F401
