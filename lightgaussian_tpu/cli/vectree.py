"""CLI: VecTree vector quantization of a trained Gaussian PLY.

TPU build of `/root/reference/vectree/vectree.py:10-26,218-226` with the same
flag surface: importance-weighted VQ of the SH features of the least-important
`vq_ratio` fraction into a `codebook_size` codebook, bit-packed to an
`extreme_saving/` bundle (+ zip size report), then dequantized back to a PLY
unless `--no_save_ply`.

Usage:
  python -m lightgaussian_tpu.cli.vectree \
      --important_score_npz_path <dir_or_npz> \
      --input_path <.../point_cloud.ply> --save_path <out_dir>
"""
from __future__ import annotations

import argparse

from lightgaussian_tpu.cli import common
from pathlib import Path

import numpy as np

from lightgaussian_tpu.compress import vectree as vt
from lightgaussian_tpu.data import ply as ply_io


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="vectree quantization")
    parser.add_argument("--important_score_npz_path", type=str, required=True)
    parser.add_argument("--input_path", type=str, required=True)
    parser.add_argument("--save_path", type=str, required=True)
    parser.add_argument("--no_save_ply", action="store_true")
    # None = infer from the input PLY; an explicit mismatching value errors.
    parser.add_argument("--sh_degree", type=int, default=None)
    parser.add_argument("--iteration_num", type=int, default=1000)
    parser.add_argument("--vq_ratio", type=float, default=0.6)
    parser.add_argument("--codebook_size", type=int, default=2**13)
    parser.add_argument("--no_IS", action="store_true")
    parser.add_argument("--vq_way", type=str, default="half")
    parser.add_argument("--seed", type=int, default=0)
    return parser


def resolve_imp_path(path: str | Path) -> Path:
    """The reference accepts a model dir or the npz itself (`vectree.py:12`)."""
    p = Path(path)
    return p if p.suffix == ".npz" else p / "imp_score.npz"


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    common.enable_compile_cache()
    scene = ply_io.load_gaussian_ply(args.input_path)
    sh_degree = args.sh_degree if args.sh_degree is not None else scene.max_sh_degree
    cfg = vt.VQConfig(
        sh_degree=sh_degree,
        vq_ratio=args.vq_ratio,
        codebook_size=args.codebook_size,
        iterations=args.iteration_num,
        no_importance=args.no_IS,
        vq_way=args.vq_way,
    )
    imp = np.load(resolve_imp_path(args.important_score_npz_path))["arr_0"]
    print(
        f"VQ: {int(scene.num_alive())} gaussians, sh_degree {cfg.sh_degree} "
        f"(dim {cfg.sh_dim}), ratio {cfg.vq_ratio}, codebook {cfg.codebook_size}"
    )
    result, deq_scene = vt.quantize_scene(scene, imp, args.save_path, cfg, seed=args.seed)
    print(f"extreme_saving bundle: {result.size_mb:.3f} MB")
    if not args.no_save_ply:
        out_ply = Path(args.save_path) / "extreme_saving.ply"
        ply_io.save_gaussian_ply(deq_scene, out_ply)
        print(f"dequantized PLY: {out_ply}")


if __name__ == "__main__":
    main()
