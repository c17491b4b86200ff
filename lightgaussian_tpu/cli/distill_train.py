"""CLI: SH distillation — degree-3 teacher into a lower-degree student.

TPU build of `/root/reference/distill_train.py:186-222`: teacher and student
restored from the same checkpoint or PLY; student SH truncated to
`--new_max_sh`; trained on teacher renders with optional pose augmentation
(2 of 3 iterations, `--augmented_view`); optionally distill covariance too
(`--enable_covariance` unfreezes scaling/rotation/opacity); saves
`imp_score.npz` at the end.

Usage: python -m lightgaussian_tpu.cli.distill_train -s <scene> -m <out> \
           --start_pointcloud <ply> --new_max_sh 2 --augmented_view
"""
from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from lightgaussian_tpu.cli import common
from lightgaussian_tpu.config import TrainConfig
from lightgaussian_tpu.data import load_gaussian_ply
from lightgaussian_tpu.data.scene import Scene
from lightgaussian_tpu.ops.rasterize import default_max_instances
from lightgaussian_tpu.render.poses import gaussian_pose
from lightgaussian_tpu.train import checkpoint as ckpt_mod
from lightgaussian_tpu.train import distill, gss, loop
from lightgaussian_tpu.train.state import init_train_state
from lightgaussian_tpu.train.step import make_eval_render
from lightgaussian_tpu.utils.general import safe_state
from lightgaussian_tpu.utils.logging import MetricsLogger, StepTimer, prepare_output_dir, training_report


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="SH distillation")
    common.add_standard_groups(parser)
    parser.add_argument("--test_iterations", nargs="+", type=int, default=[35_000, 40_000])
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[40_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[40_000])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--start_pointcloud", type=str, default=None)
    parser.add_argument("--new_max_sh", type=int, default=2)
    parser.add_argument("--augmented_view", action="store_true")
    parser.add_argument("--enable_covariance", action="store_true",
                        help="unfreeze scaling/rotation (distill_train.py:83-85)")
    parser.add_argument("--enable_opacity", action="store_true",
                        help="unfreeze opacity (distill_train.py:86-87; the "
                             "reference's script passes only --enable_covariance)")
    parser.add_argument("--iteration_base", type=int, default=30_000)
    parser.add_argument("--iterations_total", type=int, default=40_000)
    parser.add_argument("--lr_gamma", type=float, default=0.90)
    parser.add_argument("--lr_step_every", type=int, default=500)
    parser.add_argument("--v_pow", type=float, default=0.1)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--interpret", action="store_true", default=None)
    parser.add_argument("--fast_teacher", action="store_true",
                        help="render the frozen teacher with the render-only "
                             "fast kernel instead of the exact training kernel "
                             "(~1 ms/step faster; target delta <= 1e-2 worst / "
                             "~4e-4 measured; PARITY.md deliberate divergences). "
                             "Default matches the reference: teacher and "
                             "student share the exact rasterizer kernel")
    common.add_debug_nans_flag(parser)
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    common.enable_compile_cache()
    common.apply_debug_flags(args)
    model, pipeline, opt = common.extract_standard(args)
    safe_state(args.quiet, seed=args.seed)
    interpret = common.interpret_default() if args.interpret is None else args.interpret

    cfg = TrainConfig(model=model, pipeline=pipeline, opt=opt, seed=args.seed)
    out = prepare_output_dir(model.model_path, cfg)
    scene = Scene(
        model.source_path, out, images_dir=model.images,
        white_background=model.white_background, eval_split=model.eval,
        resolution=model.resolution, seed=args.seed,
    )
    bg = jnp.ones(3) if model.white_background else jnp.zeros(3)

    # teacher: frozen full-SH model (distill_train.py:66-80)
    if args.start_checkpoint:
        t_state, first_iter, _ = ckpt_mod.load_checkpoint(args.start_checkpoint)
        teacher = t_state.scene
    elif args.start_pointcloud:
        teacher = load_gaussian_ply(args.start_pointcloud)
        first_iter = args.iteration_base
    else:
        teacher = scene.gaussians
        first_iter = args.iteration_base
    student = distill.init_student(teacher, args.new_max_sh)
    state = init_train_state(student)
    print(
        f"Distilling SH deg {teacher.max_sh_degree} -> {args.new_max_sh}; "
        f"{int(teacher.num_alive())} gaussians; covariance "
        f"{'unfrozen' if args.enable_covariance else 'frozen'}"
    )

    cams = scene.getTrainCameras()
    test_cams = scene.getTestCameras()
    max_instances = default_max_instances(state.scene, cams[0])
    # Separate freeze gates like the reference (`distill_train.py:83-87`):
    # scaling/rotation behind --enable_covariance, opacity behind
    # --enable_opacity (the operating-point script enables only the former).
    frozen = ()
    if not args.enable_covariance:
        frozen += ("log_scales", "quats")
    if not args.enable_opacity:
        frozen += ("opacity_logits",)
    step_fn = distill.make_distill_step(
        opt, scene.cameras_extent, max_instances,
        gamma=args.lr_gamma, gamma_every=args.lr_step_every,
        frozen_fields=frozen, interpret=interpret,
        teacher_fast=args.fast_teacher,
    )
    eval_fn = make_eval_render(max_instances, interpret=interpret)
    logger = MetricsLogger(out)
    timer = StepTimer()
    rng = np.random.default_rng(args.seed)
    import random as pyrandom

    prand = pyrandom.Random(args.seed)

    camera_stack = []
    ema = 0.0
    # Async metrics draining, as in train/loop.py: steps dispatch without a
    # per-iteration host sync; losses drain in one batched transfer every 8.
    pending = []

    def drain():
        nonlocal ema
        ready, pending[:] = list(pending), []
        if not ready:
            return
        for (it0, _), loss in zip(ready, jax.device_get([m.loss for _, m in ready])):
            loss = float(loss)
            ema = 0.4 * loss + 0.6 * ema if it0 > first_iter + 1 else loss
            logger.scalar("distill/loss", loss, it0)

    for iteration in range(first_iter + 1, args.iterations_total + 1):
        timer.resume()
        if not camera_stack:
            camera_stack = list(cams)
        cam = camera_stack.pop(prand.randrange(len(camera_stack)))
        # 2 of 3 iterations use a perturbed pose (distill_train.py:132-137)
        if args.augmented_view and iteration % 3 != 0:
            # reference jitter: translation sigma 0.05, NO rotation jitter
            # (distill_train.py:133)
            cam = gaussian_pose(cam, rng, std_translation=0.05, std_rotation=0.0)

        state, metrics = step_fn(state, teacher, cam, bg)
        pending.append((iteration, metrics))
        if iteration % 8 == 0:
            drain()
        if iteration % 100 == 0:
            drain()
            jax.block_until_ready(state.scene.sh_dc)
            print(f"[{iteration}/{args.iterations_total}] distill loss={ema:.6f}")

        if iteration in args.test_iterations:
            drain()
            jax.block_until_ready(state.scene.sh_dc)
            timer.pause()
            training_report(
                logger, iteration, state.scene, eval_fn, test_cams,
                cams[: min(5, len(cams))], bg, timer.total,
            )
        if iteration in args.save_iterations:
            timer.pause()
            scene.save(iteration, state.scene)
        if iteration in args.checkpoint_iterations:
            timer.pause()
            ckpt_mod.save_checkpoint(
                Path(out) / f"chkpnt{iteration}.npz", state, iteration, scene.cameras_extent
            )

    drain()
    timer.pause()
    # final imp_score export (distill_train.py:174-183)
    _, imp = gss.accumulate_gss_auto(state.scene, cams, bg, max_instances, interpret)
    v_imp = gss.calculate_v_imp_score(state.scene, imp, args.v_pow)
    loop.save_imp_score(Path(out) / "imp_score.npz", state.scene, np.asarray(v_imp))
    logger.close()
    print("\nDistillation complete.")


if __name__ == "__main__":
    main()
