"""CLI: compute and export the Global Significance Score of a checkpoint.

TPU build of `/root/reference/utils/save_imp_score.py:36-83`: load a training
checkpoint, accumulate per-Gaussian hit counts and blending contributions over
ALL train cameras (`prune.py:133-157`), weight by normalized volume^v_pow
(`prune.py:112-128`), save `imp_score.npz`; `--show_imp_score` prints summary
percentiles. `--get_fps` times a full train-set render sweep.

Usage: python -m lightgaussian_tpu.cli.save_imp_score -s <scene> -m <model>
           --start_checkpoint <chkpnt.npz>
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from lightgaussian_tpu.cli import common
from lightgaussian_tpu.data.scene import Scene
from lightgaussian_tpu.ops.rasterize import default_max_instances
from lightgaussian_tpu.train import gss, loop
from lightgaussian_tpu.train.checkpoint import load_checkpoint
from lightgaussian_tpu.utils.general import safe_state


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Export imp_score.npz for a checkpoint")
    common.add_standard_groups(parser, opt=False)
    parser.add_argument("--start_checkpoint", type=str, required=True)
    parser.add_argument("--v_pow", type=float, default=0.1)
    parser.add_argument("--show_imp_score", action="store_true")
    parser.add_argument("--get_fps", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--interpret", action="store_true", default=None)
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    common.enable_compile_cache()
    model, _, _ = common.extract_standard(args, opt=False)
    safe_state(args.quiet)
    interpret = common.interpret_default() if args.interpret is None else args.interpret

    scene = Scene(
        model.source_path, model.model_path, images_dir=model.images,
        white_background=model.white_background, eval_split=model.eval,
        resolution=model.resolution,
    )
    state, iteration, _ = load_checkpoint(args.start_checkpoint)
    print(f"Loaded checkpoint at iteration {iteration}")
    bg = jnp.ones(3) if model.white_background else jnp.zeros(3)
    cams = scene.getTrainCameras()
    max_instances = default_max_instances(state.scene, cams[0])

    _, imp = gss.accumulate_gss_auto(state.scene, cams, bg, max_instances, interpret)
    v_imp = gss.calculate_v_imp_score(state.scene, imp, args.v_pow)
    out = Path(model.model_path) / "imp_score.npz"
    loop.save_imp_score(out, state.scene, np.asarray(v_imp))
    print(f"Saved {out}")

    if args.show_imp_score:
        alive = np.asarray(state.scene.alive)
        scores = np.asarray(v_imp)[alive]
        qs = np.percentile(scores, [0, 10, 50, 90, 100])
        print(
            f"imp_score over {alive.sum()} gaussians: min {qs[0]:.4g} "
            f"p10 {qs[1]:.4g} median {qs[2]:.4g} p90 {qs[3]:.4g} max {qs[4]:.4g}"
        )

    if args.get_fps:
        from lightgaussian_tpu.ops.rasterize import render

        fn = jax.jit(
            lambda s, c, b: render(s, c, b, max_instances=max_instances,
                                   interpret=interpret, fast=True).render
        )
        jax.block_until_ready(fn(state.scene, cams[0], bg))  # compile
        t0 = time.perf_counter()
        for cam in cams:
            jax.block_until_ready(fn(state.scene, cam, bg))
        dt = time.perf_counter() - t0
        print(f"render FPS over {len(cams)} train views: {len(cams) / dt:.1f}")


if __name__ == "__main__":
    main()
