"""SH distillation: degree-3 teacher -> lower-degree student.

The TPU formulation of `/root/reference/distill_train.py:61-183`: teacher and
student are two GaussianScene pytrees restored from the same checkpoint; the
student's `sh_rest` is truncated to the new degree (`gaussian_model.py:129-136`)
and trained to match the frozen teacher's renders with the usual
L1 + lambda * D-SSIM loss (the dataset's gt images are never used). Per
iteration, with `augmented_view`, 2 of 3 steps render from a Gaussian-jittered
pose (`distill_train.py:132-137`). A global ExponentialLR multiplier
(gamma=0.90 every 500 steps, `distill_train.py:81,120-122`) rides on top of the
per-group LRs, and scaling/rotation/opacity can be frozen
(`distill_train.py:83-87`).

Teacher and student renders run inside ONE jitted step so XLA can overlap them;
the teacher is closed over as a constant-folded pytree argument.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from lightgaussian_tpu.config import OptimizationParams
from lightgaussian_tpu.models.camera import Camera
from lightgaussian_tpu.models.gaussians import GaussianScene
from lightgaussian_tpu.ops import losses
from lightgaussian_tpu.ops.rasterize import render
from lightgaussian_tpu.train import optim
from lightgaussian_tpu.train.state import TrainState
from lightgaussian_tpu.train.step import StepMetrics


from lightgaussian_tpu.utils.general import exponential_decay_every as exponential_lr_mult  # noqa: E402


def make_distill_step(
    opt_cfg: OptimizationParams,
    spatial_lr_scale: float,
    max_instances: int,
    gamma: float = 0.90,
    gamma_every: int = 500,
    frozen_fields: tuple = ("log_scales", "quats", "opacity_logits"),
    interpret: bool = False,
    teacher_fast: bool = False,
):
    """Build distill_step(state, teacher, camera, bg) -> (state, metrics).

    `frozen_fields` defaults to the reference's `--enable_covariance`-off
    behavior (only position + SH train; `distill_train.py:83-87` freezes
    scaling/rotation/opacity unless covariance distillation is enabled).
    """
    lr_fns = optim.make_lr_fns(opt_cfg, spatial_lr_scale)
    lr_mult_fn = exponential_lr_mult(gamma, gamma_every)

    @jax.jit
    def distill_step(state: TrainState, teacher: GaussianScene, camera: Camera, bg: jnp.ndarray):
        # The teacher is frozen, so no gradients flow through it and its
        # backward-only binning products DCE away either way. The default
        # (teacher_fast=False) renders it through the SAME exact kernel as
        # the student, matching the reference (distill_train.py renders both
        # through one rasterizer). teacher_fast=True opts into the
        # render-only fast kernel: target deviation bounded by the
        # early-stop band (<= T_EPS/(1-MAX_ALPHA) = 1e-2 worst, ~4e-4
        # measured — below PNG quantization; pallas_blend._fast_kernel) for
        # a measured ~1 ms of a ~107 ms step — marginal, hence opt-in.
        teacher_img = render(
            teacher, camera, bg, max_instances=max_instances, interpret=interpret,
            fast=teacher_fast,
        ).render
        teacher_img = jax.lax.stop_gradient(teacher_img)

        def loss_fn(params):
            s = state.scene.with_params(params)
            out = render(s, camera, bg, max_instances=max_instances, interpret=interpret)
            l1 = losses.l1_loss(out.render, teacher_img)
            ssim_v = losses.ssim(out.render, teacher_img)
            loss = (1.0 - opt_cfg.lambda_dssim) * l1 + opt_cfg.lambda_dssim * (1.0 - ssim_v)
            return loss, (out, l1)

        (loss, (out, l1)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.scene.params()
        )
        for f in frozen_fields:
            grads[f] = jnp.zeros_like(grads[f])

        new_params, new_opt = optim.adam_update(
            state.scene.params(), grads, state.opt, lr_fns, state.step,
            state.scene.alive, lr_mult_fn(state.step),
        )
        new_state = dataclasses.replace(
            state,
            scene=state.scene.with_params(new_params),
            opt=new_opt,
            step=state.step + 1,
        )
        metrics = StepMetrics(
            loss=loss,
            l1=l1,
            psnr=losses.psnr(out.render, teacher_img),
            num_instances=out.num_instances,
            n_visible=(out.visibility & state.scene.alive).sum(),
        )
        return new_state, metrics

    return distill_step


def init_student(teacher: GaussianScene, new_sh_degree: int) -> GaussianScene:
    """Student init: same checkpoint, SH truncated to the new degree
    (`distill_train.py:73-80`)."""
    return teacher.truncate_sh(new_sh_degree)
