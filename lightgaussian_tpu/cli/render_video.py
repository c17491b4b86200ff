"""CLI: trajectory rendering of a saved (optionally VQ-compressed) model.

TPU build of `/root/reference/render_video.py:160-184`: `--video` renders the
default PCA-ellipse path (`pose_utils.py:261-322`), `--circular` a circular
offset orbit, `--spherify` a spherified inward orbit, `--gaussians`
perturbed-pose grids; train/test stills unless
skipped. `--load_vq` loads the `extreme_saving/` compressed checkpoint.

Usage: python -m lightgaussian_tpu.cli.render_video -m <model_dir> --video
"""
from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from lightgaussian_tpu.cli import common
from lightgaussian_tpu.data.scene import Scene
from lightgaussian_tpu.ops.rasterize import default_max_instances
from lightgaussian_tpu.render import poses as pose_gen
from lightgaussian_tpu.render import sets as render_sets
from lightgaussian_tpu.utils.general import safe_state


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Render camera trajectories")
    common.add_standard_groups(parser, opt=False)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--video", action="store_true")
    parser.add_argument("--circular", action="store_true")
    parser.add_argument("--spherify", action="store_true")
    parser.add_argument("--spiral", action="store_true",
                        help="flat FoV-derived spiral orbit (pose_utils.py:518-551 variant)")
    parser.add_argument("--radius", default=5.0, type=float)
    parser.add_argument("--gaussians", action="store_true")
    parser.add_argument("--mean", default=0.0, type=float)
    parser.add_argument("--std", default=0.03, type=float)
    parser.add_argument("--n_frames", default=600, type=int)
    parser.add_argument(
        "--rebin_every", default=8, type=int,
        help="UPPER BOUND on trajectory frames between fresh binnings; the "
        "operative gate is --drift_px (measured splat drift). 1 = bin every "
        "frame",
    )
    parser.add_argument(
        "--drift_px", default=1.5, type=float,
        help="rebin when the max screen-space drift of sampled splats since "
        "the last keyframe exceeds this many pixels (<=1 px is covered by "
        "the binning's +1 px tile-footprint margin); raise for faster, "
        "staler previews",
    )
    parser.add_argument("--load_vq", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--interpret", action="store_true", default=None)
    return parser


def main(argv=None) -> None:
    args = common.get_combined_args(build_parser(), argv)
    common.enable_compile_cache()
    model, _, _ = common.extract_standard(args, opt=False)
    safe_state(args.quiet)
    interpret = common.interpret_default() if args.interpret is None else args.interpret

    scene = Scene(
        model.source_path, model.model_path, images_dir=model.images,
        white_background=model.white_background, eval_split=model.eval,
        resolution=model.resolution, load_iteration=args.iteration,
        shuffle=False, load_vq=args.load_vq,
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

    if args.video:
        render_sets.render_trajectory(
            model.model_path, "ellipse", scene.loaded_iter, cams,
            scene.gaussians, bg, max_instances, n_frames=args.n_frames, rebin_every=args.rebin_every, drift_px=args.drift_px,
            interpret=interpret,
        )
    if args.circular:
        render_sets.render_trajectory(
            model.model_path, "circular", scene.loaded_iter, cams,
            scene.gaussians, bg, max_instances, n_frames=args.n_frames, rebin_every=args.rebin_every, drift_px=args.drift_px,
            radius=args.radius, interpret=interpret,
        )
    if args.spherify:
        render_sets.render_trajectory(
            model.model_path, "spherify", scene.loaded_iter, cams,
            scene.gaussians, bg, max_instances, n_frames=args.n_frames, rebin_every=args.rebin_every, drift_px=args.drift_px,
            interpret=interpret,
        )
    if args.spiral:
        render_sets.render_trajectory(
            model.model_path, "spiral", scene.loaded_iter, cams,
            scene.gaussians, bg, max_instances, n_frames=args.n_frames, rebin_every=args.rebin_every, drift_px=args.drift_px,
            interpret=interpret,
        )
    if args.gaussians:
        # perturbed-pose grid around each of a few training views
        # (`render_video.py:123-137`)
        rng = np.random.default_rng(0)
        from pathlib import Path

        base = Path(model.model_path) / "perturbed" / f"ours_{scene.loaded_iter}"
        fn_cams = [
            pose_gen.gaussian_pose(cams[i % len(cams)], rng, mean=args.mean, std_translation=args.std)
            for i in range(min(args.n_frames, 100))
        ]
        from lightgaussian_tpu.ops.rasterize import render as _render

        for idx, cam in enumerate(fn_cams):
            img = _render(
                scene.gaussians, cam, bg, max_instances=max_instances, interpret=interpret
            ).render
            render_sets.save_png(img, base / f"{idx:05d}.png")


if __name__ == "__main__":
    main()
