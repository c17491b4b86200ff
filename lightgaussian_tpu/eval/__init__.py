"""Evaluation: image metrics (SSIM/PSNR/LPIPS) and results reporting."""
from lightgaussian_tpu.eval import lpips  # noqa: F401  (submodule, not function)
from lightgaussian_tpu.eval.lpips import get_lpips_params  # noqa: F401
from lightgaussian_tpu.eval.lpips import lpips as lpips_distance  # noqa: F401
from lightgaussian_tpu.eval.metrics import (  # noqa: F401
    evaluate_image_pair,
    evaluate_method_dir,
    evaluate_model_paths,
    load_image,
)
