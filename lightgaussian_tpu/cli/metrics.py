"""CLI: compute SSIM/PSNR/LPIPS over rendered sets.

TPU build of `/root/reference/metrics.py:119-130`: walks each
`<model>/test/ours_<it>/{renders,gt}` pair, writes `results.json` +
`per_view.json` into the model dir.

Usage: python -m lightgaussian_tpu.cli.metrics -m <model_dir> [<model_dir> ...]
"""
from __future__ import annotations

import argparse

from lightgaussian_tpu.cli import common

from lightgaussian_tpu.eval.metrics import evaluate_model_paths


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Evaluate rendered model sets")
    parser.add_argument(
        "--model_paths", "-m", required=True, nargs="+", type=str, default=[]
    )
    parser.add_argument("--set_name", type=str, default="test")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    common.enable_compile_cache()
    evaluate_model_paths(args.model_paths, set_name=args.set_name)


if __name__ == "__main__":
    main()
