"""CLI: render train/test sets of a saved iteration to PNG directories.

TPU build of `/root/reference/render.py:80-103` — same flags (`--iteration -1`
= latest, `--skip_train/--skip_test`, `--load_vq` for `extreme_saving/`
compressed checkpoints) plus `--new_sh` for SH-truncating loads
(`scene/__init__.py:104-117` dispatch). Config saved at train time is merged
back via `cfg_args.json` like the reference's `get_combined_args`.

Usage: python -m lightgaussian_tpu.cli.render_sets -m <model_dir> [-s <scene>]
"""
from __future__ import annotations

import argparse

import jax.numpy as jnp

from lightgaussian_tpu.cli import common
from lightgaussian_tpu.data.scene import Scene
from lightgaussian_tpu.ops.rasterize import default_max_instances
from lightgaussian_tpu.render import sets as render_sets
from lightgaussian_tpu.utils.general import safe_state


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Render saved train/test sets")
    common.add_standard_groups(parser, opt=False)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--load_vq", action="store_true")
    parser.add_argument("--new_sh", type=int, default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--interpret", action="store_true", default=None)
    return parser


def main(argv=None) -> None:
    args = common.get_combined_args(build_parser(), argv)
    common.enable_compile_cache()
    model, pipeline, _ = common.extract_standard(args, opt=False)
    safe_state(args.quiet)
    interpret = common.interpret_default() if args.interpret is None else args.interpret
    print(f"Rendering {model.model_path}")

    scene = Scene(
        model.source_path, model.model_path, images_dir=model.images,
        white_background=model.white_background, eval_split=model.eval,
        resolution=model.resolution, load_iteration=args.iteration,
        shuffle=False, load_vq=args.load_vq, new_sh_degree=args.new_sh,
    )
    bg = jnp.ones(3) if model.white_background else jnp.zeros(3)
    cams = scene.getTrainCameras() or scene.getTestCameras()
    max_instances = default_max_instances(scene.gaussians, cams[0])

    if not args.skip_train and scene.getTrainCameras():
        render_sets.render_set(
            model.model_path, "train", scene.loaded_iter, scene.getTrainCameras(),
            scene.gaussians, bg, max_instances, interpret=interpret,
        )
    if not args.skip_test and scene.getTestCameras():
        render_sets.render_set(
            model.model_path, "test", scene.loaded_iter, scene.getTestCameras(),
            scene.gaussians, bg, max_instances, interpret=interpret,
        )


if __name__ == "__main__":
    main()
