"""CLI: prune a trained model by GSS and finetune to recover.

TPU build of `/root/reference/prune_finetune.py:290-347`: start from a training
checkpoint (`--start_checkpoint`) or an interchange PLY
(`--start_pointcloud`), prune at `--prune_iterations` by `--prune_type`, and
finetune with a global ExponentialLR(gamma=0.95 every 400) multiplier. Script
defaults in the reference use prune_percent 0.66 + v_important_score
(`scripts/run_prune_finetune.sh:37-45`).

Usage: python -m lightgaussian_tpu.cli.prune_finetune -s <scene> -m <out> \
           --start_pointcloud <ply> --prune_percent 0.66
"""
from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from lightgaussian_tpu.cli import common
from lightgaussian_tpu.config import TrainConfig
from lightgaussian_tpu.data import load_gaussian_ply
from lightgaussian_tpu.data.scene import Scene
from lightgaussian_tpu.train import loop
from lightgaussian_tpu.train.state import init_train_state
from lightgaussian_tpu.utils.general import exponential_decay_every, safe_state
from lightgaussian_tpu.utils.logging import MetricsLogger, prepare_output_dir


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="GSS prune + recovery finetune")
    common.add_standard_groups(parser)
    parser.add_argument("--test_iterations", nargs="+", type=int, default=[30_000, 35_000])
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[35_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[35_000])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--start_pointcloud", type=str, default=None)
    parser.add_argument("--prune_iterations", nargs="+", type=int, default=[30_001])
    parser.add_argument("--prune_percent", type=float, default=0.1)
    parser.add_argument("--prune_decay", type=float, default=1.0)
    parser.add_argument(
        "--prune_type", type=str, default="important_score",
        choices=["important_score", "v_important_score", "max_v_important_score", "count", "opacity"],
    )
    parser.add_argument("--v_pow", type=float, default=0.1)
    parser.add_argument("--lr_gamma", type=float, default=0.95)
    parser.add_argument("--lr_step_every", type=int, default=400)
    parser.add_argument("--iteration_base", type=int, default=30_000)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--interpret", action="store_true", default=None)
    common.add_debug_nans_flag(parser)
    common.add_cache_gt_ssim_flag(parser)
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    common.enable_compile_cache()
    common.apply_debug_flags(args)
    model, pipeline, opt = common.extract_standard(args)
    if opt.iterations == 30_000:
        opt = dataclasses.replace(opt, iterations=35_000)
    cfg = TrainConfig(
        model=model, pipeline=pipeline, opt=opt,
        test_iterations=args.test_iterations,
        save_iterations=args.save_iterations,
        checkpoint_iterations=args.checkpoint_iterations,
        prune_iterations=args.prune_iterations,
        prune_percent=args.prune_percent,
        prune_decay=args.prune_decay,
        v_pow=args.v_pow,
        seed=args.seed,
    )
    safe_state(args.quiet, seed=args.seed)
    interpret = common.interpret_default() if args.interpret is None else args.interpret

    out = prepare_output_dir(model.model_path, cfg)
    scene = Scene(
        model.source_path, out, images_dir=model.images,
        white_background=model.white_background, eval_split=model.eval,
        resolution=model.resolution, seed=args.seed,
    )
    bg = jnp.ones(3) if model.white_background else jnp.zeros(3)

    first_iter = args.iteration_base
    if args.start_checkpoint:
        from lightgaussian_tpu.train.checkpoint import load_checkpoint

        state, first_iter, _ = load_checkpoint(args.start_checkpoint)
        print(f"Resumed checkpoint at iteration {first_iter}")
    elif args.start_pointcloud:
        gaussians = load_gaussian_ply(args.start_pointcloud)
        state = init_train_state(gaussians)
        print(f"Loaded point cloud {args.start_pointcloud} ({int(gaussians.num_alive())} gaussians)")
    else:
        state = init_train_state(scene.gaussians)

    lr_mult = exponential_decay_every(args.lr_gamma, args.lr_step_every)
    logger = MetricsLogger(out)
    state = loop.train(
        scene, cfg, bg, state=state, first_iter=first_iter,
        densify=False, lr_mult_fn=lr_mult, sh_degree_interval=None,
        interpret=interpret, logger=logger, seed=args.seed,
        prune_type=args.prune_type, cache_gt_ssim=args.cache_gt_ssim,
    )
    logger.close()
    print("\nPrune + finetune complete.")


if __name__ == "__main__":
    main()
