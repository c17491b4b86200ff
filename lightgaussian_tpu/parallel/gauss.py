"""Gaussian-sharded multi-chip training — the FSDP/ZeRO analogue for 3D-GS.

For scenes whose Gaussian arrays + Adam moments exceed one chip's HBM, a
(data, gauss) mesh shards every per-Gaussian array (params, optimizer
moments, densification stats, alive mask) along capacity over the `gauss`
axis. The reference has no equivalent (single GPU throughout, SURVEY.md §2.3);
this is the "Gaussian-sharded mode (gathers of culled/visible Gaussians + grad
scatter) for scenes exceeding HBM" called for there.

One `gauss` axis serves double duty, so the blend work is NOT replicated:

- **Sharded preprocess**: each chip culls/projects/colors only its own
  capacity/G Gaussians (compute and param memory sharded).
- **Splat all_gather**: the packed screen-space splats (~9 floats each —
  far smaller than the ~59-float parameters + 118 floats of Adam moments,
  which never leave their shard) are `all_gather`'d over ICI.
- **Strip-sharded blend**: each chip bins + blends its own horizontal strip
  of tile rows over the FULL gathered splat set — the same spatial
  decomposition as `parallel/train.py`, reusing one axis for both roles.
- **Backward**: the image all_gather's VJP routes pixel gradients to the
  owning strip; the splat all_gather's VJP is a `reduce_scatter` that sums
  each strip's per-splat gradients and hands every chip exactly its own
  shard's — so the Adam update runs shard-locally with zero further traffic.
- Parameter gradients are `pmean`'d over `data` only (camera batch DP).

Densify/prune remain replicated-state passes: gather the state once every
densification interval (rare), repartition, re-shard — see
`gather_state` / `shard_state`.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lightgaussian_tpu.config import OptimizationParams
from lightgaussian_tpu.models.camera import Camera, index_camera
from lightgaussian_tpu.ops import losses
from lightgaussian_tpu.ops.rasterize import tiled as tiled_mod
from lightgaussian_tpu.ops.rasterize.projection import Splats, preprocess
from lightgaussian_tpu.train import optim
from lightgaussian_tpu.train.state import TrainState
from lightgaussian_tpu.train.step import StepMetrics

DATA_AXIS = "data"
GAUSS_AXIS = "gauss"


def make_gauss_mesh(data: int | None = None, gauss: int = 1, devices=None) -> Mesh:
    """A (data, gauss) mesh: camera-batch DP x Gaussian/strip sharding."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if data is None:
        assert n % gauss == 0, f"{n} devices not divisible by gauss={gauss}"
        data = n // gauss
    assert data * gauss <= n, f"mesh {data}x{gauss} > {n} devices"
    grid = np.asarray(devices[: data * gauss]).reshape(data, gauss)
    return Mesh(grid, (DATA_AXIS, GAUSS_AXIS))


def state_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for every per-Gaussian array: capacity split over `gauss`."""
    return NamedSharding(mesh, P(GAUSS_AXIS))


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a replicated TrainState with per-Gaussian arrays sharded over
    `gauss` (scalars like `step` replicated)."""
    cap = state.capacity
    shard = state_sharding(mesh)
    rep = NamedSharding(mesh, P())

    def place(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == cap:
            return jax.device_put(x, shard)
        return jax.device_put(x, rep)

    return jax.tree.map(place, state)


def gather_state(state: TrainState) -> TrainState:
    """Pull a sharded TrainState back to single-device host-replicated form
    (for densify/prune repartition, checkpointing, rendering)."""
    return jax.tree.map(lambda x: jax.device_get(x), state)


def _gather_splats(splats: Splats) -> Splats:
    """all_gather each splat field over the gauss axis (leading-axis concat).

    `radius` is int32 (non-differentiable); the float fields participate in
    autodiff, so their all_gather VJP is the reduce_scatter that returns each
    chip its own shard's gradient summed over all strips.
    """
    def ag(x):
        return jax.lax.all_gather(x, GAUSS_AXIS, axis=0, tiled=True)

    return Splats(
        mean2d=ag(splats.mean2d),
        conic=ag(splats.conic),
        color=ag(splats.color),
        opacity=ag(splats.opacity),
        depth=ag(splats.depth),
        radius=ag(splats.radius),
    )


def make_gauss_train_step(
    opt_cfg: OptimizationParams,
    spatial_lr_scale: float,
    max_instances: int,
    mesh: Mesh,
    image_height: int,
    lr_mult_fn=None,
    update_densify_stats: bool = True,
    interpret: bool = False,
):
    """Build the Gaussian-sharded train_step(state, camera_batch, bg).

    `state` must be sharded with `shard_state`; `camera_batch` is a stacked
    Camera with gt images, leading axis == data-axis size. `max_instances` is
    the PER-STRIP instance capacity (full splat set, strip-height grid).
    """
    lr_fns = optim.make_lr_fns(opt_cfg, spatial_lr_scale)
    n_gauss = mesh.shape[GAUSS_AXIS]
    assert image_height % n_gauss == 0, (
        f"image height {image_height} not divisible by gauss={n_gauss}"
    )
    strip_h = image_height // n_gauss

    def shard_step(state: TrainState, cams: Camera, bg):
        cap_shard = state.scene.capacity  # local shard slice
        camera = index_camera(cams, 0)
        gt = camera.gt_image
        y0 = jax.lax.axis_index(GAUSS_AXIS) * strip_h

        def loss_fn(params_shard, offset_shard):
            s = state.scene.with_params(params_shard)
            local = preprocess(s, camera, mean2d_offset=offset_shard)
            splats = _gather_splats(local)
            shift = jnp.stack([jnp.zeros_like(y0), y0]).astype(jnp.float32)
            splats = dataclasses.replace(splats, mean2d=splats.mean2d - shift[None, :])
            strip, _ft, total = tiled_mod.blend_tiled(
                splats, bg, camera.width, strip_h, max_instances, interpret
            )
            full = jax.lax.all_gather(strip, GAUSS_AXIS, axis=1, tiled=True)
            l1 = losses.l1_loss(full, gt)
            # per-camera cached GT moments ride the camera batch when staged
            ssim_v = losses.ssim(full, gt, target_stats=camera.gt_ssim_stats)
            loss = (1.0 - opt_cfg.lambda_dssim) * l1 + opt_cfg.lambda_dssim * (1.0 - ssim_v)
            return loss, (full, total, l1, local.radius)

        offset0 = jnp.zeros((cap_shard, 2), jnp.float32)
        (loss, (full, total, l1, radius_local)), (grads, offset_grad) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                state.scene.params(), offset0
            )
        )

        # Splat grads arrive shard-local via the all_gather VJP (summed over
        # strips); only the camera-batch mean crosses `data`.
        grads = jax.lax.pmean(grads, DATA_AXIS)

        lr_mult = lr_mult_fn(state.step) if lr_mult_fn is not None else 1.0
        new_params, new_opt = optim.adam_update(
            state.scene.params(), grads, state.opt, lr_fns, state.step,
            state.scene.alive, lr_mult,
        )
        scene = state.scene.with_params(new_params)

        # Densification stats: shard-local radii/grad-norm, reduced over data.
        radii = jax.lax.pmax(jnp.where(radius_local > 0, radius_local, 0), DATA_AXIS)
        visible = (radii > 0) & scene.alive
        if update_densify_stats:
            max_radii = jnp.where(
                visible,
                jnp.maximum(state.max_radii2d, radii.astype(jnp.float32)),
                state.max_radii2d,
            )
            # Per-camera accounting, as if the batch ran as n_data sequential
            # reference iterations (`scene/gaussian_model.py:784-788`): accum
            # gets the SUM of per-camera grad norms, denom the NUMBER of
            # cameras that saw the Gaussian (an OR would inflate the densify
            # gradient average by up to n_data).
            gnorm = jax.lax.psum(jnp.linalg.norm(offset_grad, axis=-1), DATA_AXIS)
            vis_cam = (radius_local > 0) & scene.alive
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
            num_instances=jax.lax.pmax(jax.lax.pmax(total, GAUSS_AXIS), DATA_AXIS),
            n_visible=jax.lax.psum(visible.sum(), GAUSS_AXIS),
        )
        return new_state, metrics

    def state_spec(state: TrainState):
        cap = state.capacity

        def spec(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == cap:
                return P(GAUSS_AXIS)
            return P()

        return jax.tree.map(spec, state)

    jitted_cache: dict = {}

    def train_step(state: TrainState, cams: Camera, bg):
        key = state.capacity
        if key not in jitted_cache:
            sspec = state_spec(state)
            sharded = jax.shard_map(
                shard_step,
                mesh=mesh,
                in_specs=(sspec, P(DATA_AXIS), P()),
                out_specs=(sspec, P()),
                check_vma=False,
            )
            jitted_cache[key] = jax.jit(sharded)
        return jitted_cache[key](state, cams, bg)

    return train_step
