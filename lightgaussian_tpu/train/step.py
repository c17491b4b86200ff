"""The jitted training step: render -> L1+D-SSIM -> backward -> Adam ->
densification-stat accumulation.

Pure-functional equivalent of the reference's hot loop
(`/root/reference/train_densify_prune.py:74-212`): one call = one iteration on
one camera. The screen-space positional gradient that drives densification is
obtained by differentiating w.r.t. an explicit zeros `mean2d_offset` input
(NDC units, carrying the 0.5*W / 0.5*H factors like the CUDA backward) instead
of the reference's dummy-tensor autograd trick.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from lightgaussian_tpu.config import OptimizationParams
from lightgaussian_tpu.models.camera import Camera
from lightgaussian_tpu.ops import losses
from lightgaussian_tpu.ops.rasterize import render
from lightgaussian_tpu.train import optim
from lightgaussian_tpu.train.state import TrainState


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    psnr: jnp.ndarray
    num_instances: jnp.ndarray
    n_visible: jnp.ndarray


def make_train_step(
    opt_cfg: OptimizationParams,
    spatial_lr_scale: float,
    max_instances: int,
    lr_mult_fn=None,
    frozen_fields: tuple = (),
    update_densify_stats: bool = True,
    interpret: bool = False,
    camera_batch: int = 1,
):
    """Build a jitted train_step(state, camera, bg) -> (state, metrics).

    `frozen_fields` zeroes gradients of selected params — the distillation
    driver's freeze of scaling/rotation/opacity (`distill_train.py:83-87`).
    `lr_mult_fn(step)` is the global ExponentialLR-style multiplier used by the
    finetune/distill drivers.

    With `camera_batch > 1` the step takes a STACKED Camera (leading dim B,
    `models.camera.stack_cameras`) and performs ONE Adam update on the
    mean-over-cameras loss — the single-chip analogue of the multi-chip
    data-parallel step (`parallel/train.py`), with identical per-camera
    densification-stat semantics (per-camera |mean2d grad| norms summed,
    denom += #cameras that saw the Gaussian; `gaussian_model.py:784-788`).
    One gradient step per B cameras is a different optimization schedule than
    B sequential steps — the standard data-parallel trade, not a bug.
    """
    if camera_batch > 1:
        return _make_train_step_batched(
            opt_cfg, spatial_lr_scale, max_instances, camera_batch,
            lr_mult_fn, frozen_fields, update_densify_stats, interpret,
        )
    lr_fns = optim.make_lr_fns(opt_cfg, spatial_lr_scale)

    @jax.jit
    def train_step(state: TrainState, camera: Camera, bg: jnp.ndarray):
        cap = state.capacity
        gt = camera.gt_image
        if gt is None:
            raise ValueError(
                "train_step needs a camera with a ground-truth image; "
                "attach one with camera.with_gt(img)."
            )

        def loss_fn(params, offset):
            s = state.scene.with_params(params)
            out = render(s, camera, bg, mean2d_offset=offset, max_instances=max_instances, interpret=interpret)
            l1 = losses.l1_loss(out.render, gt)
            # gt is constant per camera: its blur moments ride the camera
            # pytree when the loop precomputed them (cached-GT-moments path)
            ssim_v = losses.ssim(out.render, gt, target_stats=camera.gt_ssim_stats)
            loss = (1.0 - opt_cfg.lambda_dssim) * l1 + opt_cfg.lambda_dssim * (1.0 - ssim_v)
            return loss, (out, l1)

        offset0 = jnp.zeros((cap, 2), jnp.float32)
        (loss, (out, l1)), (grads, offset_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.scene.params(), offset0)

        for f in frozen_fields:
            grads[f] = jnp.zeros_like(grads[f])

        lr_mult = lr_mult_fn(state.step) if lr_mult_fn is not None else 1.0
        new_params, new_opt = optim.adam_update(
            state.scene.params(), grads, state.opt, lr_fns, state.step,
            state.scene.alive, lr_mult,
        )
        scene = state.scene.with_params(new_params)

        visible = out.visibility & scene.alive
        if update_densify_stats:
            max_radii = jnp.where(
                visible,
                jnp.maximum(state.max_radii2d, out.radii.astype(jnp.float32)),
                state.max_radii2d,
            )
            gnorm = jnp.linalg.norm(offset_grad, axis=-1)
            accum = state.xyz_grad_accum + jnp.where(visible, gnorm, 0.0)
            denom = state.denom + visible.astype(jnp.float32)
        else:
            max_radii, accum, denom = state.max_radii2d, state.xyz_grad_accum, state.denom

        new_state = dataclasses.replace(
            state,
            scene=scene,
            opt=new_opt,
            step=state.step + 1,
            max_radii2d=max_radii,
            xyz_grad_accum=accum,
            denom=denom,
        )
        metrics = StepMetrics(
            loss=loss,
            l1=l1,
            psnr=losses.psnr(out.render, gt),
            num_instances=out.num_instances,
            n_visible=visible.sum(),
        )
        return new_state, metrics

    return train_step


def _make_train_step_batched(
    opt_cfg: OptimizationParams,
    spatial_lr_scale: float,
    max_instances: int,
    camera_batch: int,
    lr_mult_fn=None,
    frozen_fields: tuple = (),
    update_densify_stats: bool = True,
    interpret: bool = False,
):
    from lightgaussian_tpu.models.camera import index_camera

    lr_fns = optim.make_lr_fns(opt_cfg, spatial_lr_scale)
    B = camera_batch

    @jax.jit
    def train_step(state: TrainState, cameras: Camera, bg: jnp.ndarray):
        cap = state.capacity

        def loss_fn(params, offsets):
            s = state.scene.with_params(params)

            def one(i):
                cam = index_camera(cameras, i)
                out = render(
                    s, cam, bg, mean2d_offset=offsets[i],
                    max_instances=max_instances, interpret=interpret,
                )
                gt = cam.gt_image
                l1 = losses.l1_loss(out.render, gt)
                ssim_v = losses.ssim(out.render, gt, target_stats=cam.gt_ssim_stats)
                loss = (1.0 - opt_cfg.lambda_dssim) * l1 + opt_cfg.lambda_dssim * (1.0 - ssim_v)
                return loss, (l1, losses.psnr(out.render, gt),
                              out.num_instances, out.radii)

            # lax.map serializes the B renders (one instance buffer's
            # intermediates at a time in the forward; grad residuals stack)
            per_cam = jax.lax.map(one, jnp.arange(B))
            loss_b, aux = per_cam
            return loss_b.mean(), aux

        offsets0 = jnp.zeros((B, cap, 2), jnp.float32)
        (loss, (l1_b, psnr_b, inst_b, radii_b)), (grads, offset_grads) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                state.scene.params(), offsets0
            )
        )

        for f in frozen_fields:
            grads[f] = jnp.zeros_like(grads[f])

        lr_mult = lr_mult_fn(state.step) if lr_mult_fn is not None else 1.0
        new_params, new_opt = optim.adam_update(
            state.scene.params(), grads, state.opt, lr_fns, state.step,
            state.scene.alive, lr_mult,
        )
        scene = state.scene.with_params(new_params)

        visible_b = (radii_b > 0) & scene.alive[None, :]  # [B, N]
        visible_any = visible_b.any(axis=0)
        if update_densify_stats:
            max_r = jnp.max(
                jnp.where(visible_b, radii_b.astype(jnp.float32), 0.0), axis=0
            )
            max_radii = jnp.maximum(state.max_radii2d, max_r)
            # Per-camera norm BEFORE summing: matches B sequential reference
            # iterations' accumulation (norm of the mean-loss batched grad
            # would under-count). offset grads carry the 1/B of loss.mean();
            # undo it so stats match per-camera L1+D-SSIM gradients.
            gnorm = jnp.linalg.norm(offset_grads * B, axis=-1)  # [B, N]
            accum = state.xyz_grad_accum + jnp.where(visible_b, gnorm, 0.0).sum(axis=0)
            denom = state.denom + visible_b.sum(axis=0).astype(jnp.float32)
        else:
            max_radii, accum, denom = state.max_radii2d, state.xyz_grad_accum, state.denom

        new_state = dataclasses.replace(
            state,
            scene=scene,
            opt=new_opt,
            step=state.step + 1,
            max_radii2d=max_radii,
            xyz_grad_accum=accum,
            denom=denom,
        )
        metrics = StepMetrics(
            loss=loss,
            l1=l1_b.mean(),
            psnr=psnr_b.mean(),
            num_instances=inst_b.max(),
            n_visible=visible_any.sum(),
        )
        return new_state, metrics

    return train_step


def make_eval_render(max_instances: int, interpret: bool = False):
    """Jitted eval render: returns (image, l1, psnr, ssim) vs the camera's gt."""

    @jax.jit
    def eval_render(scene, camera: Camera, bg: jnp.ndarray):
        out = render(scene, camera, bg, max_instances=max_instances, interpret=interpret)
        img = jnp.clip(out.render, 0.0, 1.0)
        gt = camera.gt_image
        return img, losses.l1_loss(img, gt), losses.psnr(img, gt), losses.ssim(img, gt)

    return eval_render
