"""Image-set metric evaluation — the `metrics.py` CLI core.

Walks `<model>/test/ours_<iteration>/{renders,gt}` directories produced by the
render CLI, computes SSIM / PSNR / LPIPS per view, and writes `results.json`
plus `per_view.json`, matching `/root/reference/metrics.py:38-117`.
"""
from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from lightgaussian_tpu.eval.lpips import get_lpips_params, lpips
from lightgaussian_tpu.ops import losses


def load_image(path: str | Path) -> jnp.ndarray:
    """PNG -> [3, H, W] float32 in [0, 1]."""
    from PIL import Image

    with Image.open(path) as img:
        arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return jnp.asarray(arr.transpose(2, 0, 1))


def evaluate_image_pair(render_img, gt_img, lpips_params=None):
    lpips_params = lpips_params or get_lpips_params()
    return {
        "SSIM": float(losses.ssim(render_img, gt_img)),
        "PSNR": float(losses.psnr(render_img, gt_img)),
        "LPIPS": float(lpips(lpips_params, render_img, gt_img)),
    }


def evaluate_method_dir(method_dir: str | Path, lpips_params=None) -> tuple[dict, dict]:
    """One `ours_<iteration>` directory -> (mean metrics, per-view metrics)."""
    method_dir = Path(method_dir)
    renders_dir = method_dir / "renders"
    gt_dir = method_dir / "gt"
    lpips_params = lpips_params or get_lpips_params()

    names = sorted(p.name for p in renders_dir.iterdir())
    per_view = {"SSIM": {}, "PSNR": {}, "LPIPS": {}}
    for name in names:
        r = load_image(renders_dir / name)
        g = load_image(gt_dir / name)
        m = evaluate_image_pair(r, g, lpips_params)
        for k, v in m.items():
            per_view[k][name] = v

    means = {k: float(np.mean(list(v.values()))) for k, v in per_view.items()}
    means["lpips_kind"] = lpips_params.kind
    return means, per_view


def evaluate_model_paths(
    model_paths: list[str | Path], lpips_weights=None, set_name: str = "test"
) -> dict:
    """`metrics.evaluate` (`metrics.py:38-117`): per model dir, walk
    <set_name>/ours_*, write results.json + per_view.json."""
    lpips_params = get_lpips_params(lpips_weights)
    all_results = {}
    for model_path in model_paths:
        model_path = Path(model_path)
        print(f"Scene: {model_path}")
        full, per_view_full = {}, {}
        test_dir = model_path / set_name
        for method_dir in sorted(test_dir.iterdir()):
            if not method_dir.name.startswith("ours_"):
                continue
            print(f"Method: {method_dir.name}")
            means, per_view = evaluate_method_dir(method_dir, lpips_params)
            print(f"  SSIM : {means['SSIM']:.7f}")
            print(f"  PSNR : {means['PSNR']:.7f}")
            print(f"  LPIPS: {means['LPIPS']:.7f}")
            full[method_dir.name] = means
            per_view_full[method_dir.name] = per_view

        (model_path / "results.json").write_text(json.dumps(full, indent=2))
        (model_path / "per_view.json").write_text(json.dumps(per_view_full, indent=2))
        all_results[str(model_path)] = full
    return all_results
