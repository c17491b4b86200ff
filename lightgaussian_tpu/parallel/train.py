"""Multi-chip training step: data-parallel over cameras x space-parallel over
image tile-row strips, via ``jax.shard_map`` over a (data, space) mesh.

Replaces the reference's single-GPU hot loop (`/root/reference/
train_densify_prune.py:74-212`) with an SPMD step:

- Scene params / optimizer state are REPLICATED; each (data, space) shard
  renders one camera's horizontal strip of tile rows.
- The full image is re-assembled per data-shard with ``all_gather`` over
  ``space`` so the L1 + D-SSIM loss (whose 11x11 SSIM window crosses strip
  boundaries) sees real neighbor pixels; the all_gather VJP routes pixel
  gradients back to the strip that produced them.
- Parameter gradients and densification statistics are ``psum``'d over BOTH
  axes, then one replicated Adam update runs per chip.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lightgaussian_tpu.config import OptimizationParams
from lightgaussian_tpu.models.camera import Camera, index_camera, stack_cameras
from lightgaussian_tpu.ops import losses
from lightgaussian_tpu.ops.rasterize import tiled as tiled_mod
from lightgaussian_tpu.ops.rasterize.projection import preprocess
from lightgaussian_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS
from lightgaussian_tpu.train import optim
from lightgaussian_tpu.train.state import TrainState
from lightgaussian_tpu.train.step import StepMetrics


def render_strip(scene, camera, bg, y0, strip_h, max_instances, mean2d_offset, interpret,
                 fast=False):
    """Render rows [y0, y0 + strip_h) of the camera's image by shifting the
    projected splats down by y0 and blending into a strip-sized tile grid.

    `fast=True` uses the render-only (non-differentiable) fast kernel — the
    inference path of `parallel/render.py`; training keeps the exact
    differentiable blend."""
    splats = preprocess(scene, camera, mean2d_offset=mean2d_offset)
    shift = jnp.stack([jnp.zeros_like(y0), y0.astype(jnp.float32)])
    splats = dataclasses.replace(splats, mean2d=splats.mean2d - shift[None, :])
    blend = tiled_mod.blend_tiled_fast if fast else tiled_mod.blend_tiled
    image, final_t, total = blend(
        splats, bg, camera.width, strip_h, max_instances, interpret
    )
    return image, final_t, total, splats


def make_parallel_train_step(
    opt_cfg: OptimizationParams,
    spatial_lr_scale: float,
    max_instances: int,
    mesh,
    image_height: int,
    lr_mult_fn=None,
    update_densify_stats: bool = True,
    interpret: bool = False,
):
    """Build train_step(state, camera_batch, bg) -> (state, metrics) sharded
    over `mesh`. `camera_batch` is a stacked Camera with gt images attached;
    its leading axis must equal the mesh's data-axis size. `max_instances` is
    the PER-STRIP instance capacity."""
    lr_fns = optim.make_lr_fns(opt_cfg, spatial_lr_scale)
    n_space = mesh.shape[SPACE_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    assert image_height % n_space == 0, (
        f"image height {image_height} not divisible by space={n_space}"
    )
    strip_h = image_height // n_space

    def shard_step(state: TrainState, cams: Camera, bg):
        cap = state.capacity
        camera = index_camera(cams, 0)  # local data shard has exactly 1 camera
        gt = camera.gt_image
        y0 = jax.lax.axis_index(SPACE_AXIS) * strip_h

        def loss_fn(params, offset):
            s = state.scene.with_params(params)
            strip, _ft, total, splats = render_strip(
                s, camera, bg, y0, strip_h, max_instances, offset, interpret
            )
            full = jax.lax.all_gather(strip, SPACE_AXIS, axis=1, tiled=True)
            l1 = losses.l1_loss(full, gt)
            # per-camera cached GT moments ride the camera batch when staged
            ssim_v = losses.ssim(full, gt, target_stats=camera.gt_ssim_stats)
            loss = (1.0 - opt_cfg.lambda_dssim) * l1 + opt_cfg.lambda_dssim * (1.0 - ssim_v)
            # radii ride the aux so densify stats don't pay a second O(N)
            # preprocess of every Gaussian after the grad pass
            return loss, (full, total, l1, splats.radius)

        offset0 = jnp.zeros((cap, 2), jnp.float32)
        (loss, (full, total, l1, radius)), (grads, offset_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.scene.params(), offset0)

        # Sum param grads over strips and mean over the camera batch.
        grads = jax.lax.psum(grads, SPACE_AXIS)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        offset_grad = jax.lax.psum(offset_grad, SPACE_AXIS)

        lr_mult = lr_mult_fn(state.step) if lr_mult_fn is not None else 1.0
        new_params, new_opt = optim.adam_update(
            state.scene.params(), grads, state.opt, lr_fns, state.step,
            state.scene.alive, lr_mult,
        )
        scene = state.scene.with_params(new_params)

        # Densification statistics (visibility = seen in ANY shard; the
        # reference accumulates per-iteration over its single camera —
        # here a camera batch contributes one accumulation per camera).
        radii_local = jnp.where(radius > 0, radius, 0)
        radii = jax.lax.pmax(jax.lax.pmax(radii_local, SPACE_AXIS), DATA_AXIS)
        visible = (radii > 0) & scene.alive
        if update_densify_stats:
            max_radii = jnp.where(
                visible,
                jnp.maximum(state.max_radii2d, radii.astype(jnp.float32)),
                state.max_radii2d,
            )
            # Per-camera accounting, as if the batch ran as n_data sequential
            # reference iterations: accum gets the SUM of per-camera grad
            # norms, and denom gets the NUMBER of cameras that saw the
            # Gaussian (an OR here would inflate accum/denom by up to n_data).
            gnorm = jnp.linalg.norm(offset_grad, axis=-1)
            gnorm = jax.lax.psum(gnorm, DATA_AXIS)
            vis_cam = (
                jax.lax.psum((radii_local > 0).astype(jnp.float32), SPACE_AXIS) > 0
            ) & scene.alive
            seen_cnt = jax.lax.psum(vis_cam.astype(jnp.float32), DATA_AXIS)
            accum = state.xyz_grad_accum + jnp.where(seen_cnt > 0, gnorm, 0.0)
            denom = state.denom + seen_cnt
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
            loss=jax.lax.pmean(loss, DATA_AXIS),
            l1=jax.lax.pmean(l1, DATA_AXIS),
            psnr=jax.lax.pmean(losses.psnr(full, gt), DATA_AXIS),
            num_instances=jax.lax.pmax(jax.lax.psum(total, SPACE_AXIS), DATA_AXIS),
            n_visible=visible.sum(),
        )
        return new_state, metrics

    sharded = jax.shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)
