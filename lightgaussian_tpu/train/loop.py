"""Host-side training orchestration: the iteration loop shared by the
train/finetune CLIs.

Reproduces the control flow of `/root/reference/train_densify_prune.py:43-225`
and `prune_finetune.py:55-289` around the jitted `train_step`: SH-degree
schedule, shuffled camera sampling, densify/prune/opacity-reset on schedule,
GSS pruning at given iterations with decayed percent, test-iteration reports,
PLY saves, checkpoints, and `imp_score.npz` export. The hot path stays on
device; this module only decides *when* to run which jitted pass.
"""
from __future__ import annotations

import dataclasses
import random as pyrandom
import time
from pathlib import Path
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lightgaussian_tpu.config import OptimizationParams, TrainConfig
from lightgaussian_tpu.data.scene import Scene
from lightgaussian_tpu.models.camera import Camera, stack_cameras
from lightgaussian_tpu.train import checkpoint as ckpt_mod
from lightgaussian_tpu.train import densify as densify_mod
from lightgaussian_tpu.train import gss
from lightgaussian_tpu.train.state import TrainState, grow_capacity, init_train_state
from lightgaussian_tpu.train.step import make_eval_render, make_train_step
from lightgaussian_tpu.utils.logging import MetricsLogger, StepTimer, training_report
from lightgaussian_tpu.ops.rasterize import default_max_instances


@dataclasses.dataclass
class LoopCallbacks:
    """Optional hooks (viewer GUI, custom logging)."""

    on_iteration: Callable | None = None  # (iteration, state, metrics) -> None


def make_profiler_callback(trace_dir: str, start_iter: int = 100, n_steps: int = 5):
    """On-iteration hook that captures a `jax.profiler` device trace of steps
    [start_iter, start_iter + n_steps) — the TPU-native replacement for the
    reference's paired-cuda-Event step timing (`train_densify_prune.py:66-67`;
    SURVEY.md §5 tracing). View with TensorBoard or xprof."""
    def on_iteration(iteration, state, metrics):
        if iteration == start_iter:
            print(f"[{iteration}] starting jax.profiler trace -> {trace_dir}")
            jax.profiler.start_trace(trace_dir)
        elif iteration == start_iter + n_steps:
            jax.block_until_ready(state.scene.means)
            jax.profiler.stop_trace()
            print(f"[{iteration}] profiler trace written to {trace_dir}")

    return on_iteration


def save_imp_score(path: str | Path, scene, v_imp: np.ndarray) -> None:
    """`imp_score.npz` (`train_densify_prune.py:222-225`,
    `utils/save_imp_score.py:36-57`): one score per ALIVE Gaussian, in PLY row
    order — the file must align with the packed `point_cloud.ply` that the VQ
    CLI reads back, not with this training run's (grown, hole-punched)
    capacity layout."""
    v = np.asarray(v_imp)
    alive = np.asarray(scene.alive)
    if v.shape[0] == alive.shape[0]:
        v = v[alive]
    np.savez(Path(path), v)


def gss_prune(
    state: TrainState,
    cameras: Sequence[Camera],
    bg,
    percent: float,
    v_pow: float,
    max_instances: int,
    interpret: bool = False,
    prune_type: str = "v_important_score",
) -> tuple[TrainState, np.ndarray]:
    """One GSS pruning pass: accumulate scores over ALL train cameras, rank by
    `prune_type` (`prune_finetune.py:213-270`), drop the bottom `percent`."""
    counts, imp = gss.accumulate_gss_auto(state.scene, cameras, bg, max_instances, interpret)
    v_imp = gss.calculate_v_imp_score(state.scene, imp, v_pow)
    scores = {
        "important_score": imp,
        "v_important_score": v_imp,
        # imp * max-axis scaling (`prune_finetune.py:228-232`), NOT the
        # volume-normalized v_imp
        "max_v_important_score": imp * state.scene.scales.max(axis=1),
        "count": counts.astype(jnp.float32),
        "opacity": state.scene.opacities,
    }[prune_type]
    keep = gss.percentile_keep_mask(state.scene, scores, jnp.float32(percent))
    return densify_mod.prune_by_mask(state, keep), np.asarray(v_imp)


# Auto-cache budget for per-camera GT SSIM moments: the stats add two [C,H,W]
# f32 planes per camera (2x the gt image itself, ~12.4 MB at 3x1080p). 4 GiB
# covers ~330 1080p cameras and leaves >2/3 of a v5e's 16 GB for the scene,
# optimizer, and instance buffers.
_GT_SSIM_CACHE_BUDGET_BYTES = 4 << 30


def _attach_gt_ssim_stats(cams: list[Camera], enable: bool | None) -> list[Camera]:
    """Precompute per-camera SSIM target moments (train-time cached-GT path).

    `enable=None` = auto: on when the extra storage fits the budget. The
    moments are bit-identical to what the in-step blur would produce
    (tests/test_math_core.py::TestCachedTargetSSIM), so this changes step
    TIME, not step results."""
    sized = [c for c in cams if c.gt_image is not None]
    if not sized:
        return cams
    if len(sized) != len(cams):
        # Attaching stats to only the gt-carrying cameras would make the
        # Camera pytree structurally heterogeneous (already true of gt_image
        # itself): stack_cameras would raise under camera_batch > 1 and each
        # structure would jit-trace separately at batch 1. Keep the list
        # uniform by skipping the cache outright for mixed lists.
        print(
            f"gt-SSIM moment cache disabled: {len(cams) - len(sized)} of "
            f"{len(cams)} train cameras carry no gt image (mixed pytree "
            "structures would retrace/fail to stack)"
        )
        return cams
    extra = sum(2 * 4 * int(np.prod(c.gt_image.shape)) for c in sized)
    if enable is None:
        enable = extra <= _GT_SSIM_CACHE_BUDGET_BYTES
        if not enable:
            print(
                f"gt-SSIM moment cache disabled: {extra / 1e9:.1f} GB for "
                f"{len(sized)} cameras exceeds the {_GT_SSIM_CACHE_BUDGET_BYTES / 1e9:.0f} GB "
                "auto budget (pass cache_gt_ssim=True to force)"
            )
    if not enable:
        return cams
    from lightgaussian_tpu.ops import losses as losses_mod

    precompute = jax.jit(losses_mod.precompute_ssim_target_stats)
    return [
        c.with_gt_ssim_stats(precompute(c.gt_image)) if c.gt_image is not None else c
        for c in cams
    ]


def train(
    scene: Scene,
    cfg: TrainConfig,
    bg: jnp.ndarray,
    state: TrainState | None = None,
    first_iter: int = 0,
    max_instances: int | None = None,
    densify: bool = True,
    lr_mult_fn=None,
    sh_degree_interval: int | None = 1000,
    interpret: bool = False,
    callbacks: LoopCallbacks | None = None,
    logger: MetricsLogger | None = None,
    seed: int = 0,
    prune_type: str = "v_important_score",
    gui=None,
    gui_source_path: str = "",
    camera_batch: int = 1,
    cache_gt_ssim: bool | None = None,
) -> TrainState:
    """Run the training loop; returns the final state.

    With `densify=True` this is `train_densify_prune.py`; with `densify=False`
    plus `lr_mult_fn` it is the finetune loop of `prune_finetune.py`.

    `camera_batch > 1`: each iteration consumes B cameras and performs ONE
    Adam update on the mean loss (see `make_train_step`); `opt.iterations`
    then counts optimizer steps, not cameras.
    """
    opt: OptimizationParams = cfg.opt
    # Stage every camera's arrays (incl. gt images) on device ONCE; numpy
    # leaves would otherwise re-transfer on each dispatch.
    cams = jax.device_put(scene.getTrainCameras())
    test_cams = jax.device_put(scene.getTestCameras())
    cams = _attach_gt_ssim_stats(cams, cache_gt_ssim)
    if state is None:
        state = init_train_state(scene.gaussians)
    if max_instances is None:
        max_instances = default_max_instances(state.scene, cams[0])

    step_fn = make_train_step(
        opt, scene.cameras_extent, max_instances,
        lr_mult_fn=lr_mult_fn, update_densify_stats=densify, interpret=interpret,
        camera_batch=camera_batch,
    )
    eval_fn = make_eval_render(max_instances, interpret=interpret)
    logger = logger or MetricsLogger(scene.model_path)
    timer = StepTimer()
    rng = pyrandom.Random(seed)
    key = jax.random.PRNGKey(seed)

    camera_stack: list[Camera] = []
    shrink_streak = 0
    ema_loss = 0.0
    model_path = Path(scene.model_path)

    # Host-sync decoupling: consuming metrics.loss (a device->host transfer)
    # right after step_fn would serialize every iteration on the dispatch
    # round-trip. Steps dispatch async; every SYNC_LAG iterations the pending
    # metrics drain in one batched transfer (bulk-synchronous pipelining — the
    # reference blocks per iter on loss.item(), `train_densify_prune.py:145`;
    # on TPU that stall is avoidable).
    SYNC_LAG = 8
    GROW_HEADROOM = 1.4    # densification phase: wide band, few recompiles
    SNUG_HEADROOM = 1.25   # stable phase: tight buffer, +4% step throughput
    SNUG_SHRINK_FRAC = 1.0 / (SNUG_HEADROOM * 1.065)  # shrink only if the
    #   snugged capacity would still sit ~6.5% above the observed live count
    #   (else the resize would immediately re-trigger the 0.85 grow band)
    pending: list = []  # [(iteration, metrics), ...] oldest first

    def consume_metrics() -> None:
        """Drain ALL pending step metrics (blocks on the newest one)."""
        nonlocal ema_loss, shrink_streak, resize_request
        ready, pending[:] = list(pending), []
        if not ready:
            return
        # ONE batched transfer for every drained entry: each scalar fetch pays
        # a full host<->device round trip, which at ~2 fetches/iteration can
        # rival the step itself on high-latency links.
        fetched = jax.device_get([(m.loss, m.num_instances) for _, m in ready])
        for (it0, _), (loss, inst_used) in zip(ready, fetched):
            loss = float(loss)
            ema_loss = 0.4 * loss + 0.6 * ema_loss if it0 > first_iter + 1 else loss
            logger.scalar("train_loss_patches/total_loss", loss, it0)
            inst_used = int(inst_used)
            if inst_used > max_instances:
                # The buffer filled to capacity: binning clamped, so the
                # deepest splats of THIS step were actually truncated (the
                # grow trigger below heals it, but up to SYNC_LAG iterations
                # late — make the degradation window visible, not silent).
                print(
                    f"[{it0}] instance buffer overflow: {inst_used} >= "
                    f"capacity {max_instances} — deepest splats truncated "
                    "this step; growing"
                )
            if inst_used > 0.85 * max_instances:
                resize_request = ("grow", inst_used, it0)
                shrink_streak = 0
            elif inst_used < SNUG_SHRINK_FRAC * max_instances and inst_used > 0:
                # Two-phase capacity policy (round 3, measured): growth uses
                # wide 1.4x headroom (absorbs densification between resize
                # checks); once counts STABILIZE — usage persistently below
                # ~75% of capacity for 300 consecutive iterations — snug
                # down to SNUG_HEADROOM. Every per-instance binning cost
                # scales with CAPACITY, and 1.4x -> 1.25x headroom is worth
                # +4% end-to-end step throughput (PERF.md round 3);
                # steady-state camera variance measured at +-3%, inside the
                # 0.85-grow-trigger band (snugged usage 80% vs 85% trigger).
                # A variance spike re-grows to the wide band; the 300-iter
                # streak bounds grow/shrink oscillation to one (cache-warm)
                # recompile pair per ~300 iterations.
                shrink_streak += 1
                if shrink_streak >= 300:
                    resize_request = ("shrink", inst_used, it0)
                    shrink_streak = 0
            else:
                shrink_streak = 0

    resize_request = None
    last_print_t = time.time()
    white_background = bool(np.all(np.asarray(bg) == 1.0))

    gui_render = None
    if gui is not None:
        def gui_render(cam, scale_mod, _eval=eval_fn):
            # live-viewer render at the viewer's requested pose/resolution
            from lightgaussian_tpu.ops.rasterize import render as _render

            return _render(
                state.scene, cam, bg, scale_modifier=scale_mod,
                max_instances=max_instances, interpret=interpret, fast=True,
            ).render

    for iteration in range(first_iter + 1, opt.iterations + 1):
        if gui is not None:
            timer.pause()  # viewer time excluded, like eval/save below
            gui.poll(gui_render, gui_source_path, iteration >= opt.iterations)

        timer.resume()

        if sh_degree_interval and iteration % sh_degree_interval == 0:
            state = dataclasses.replace(state, scene=state.scene.one_up_sh_degree())

        if camera_batch > 1:
            picked = []
            for _ in range(camera_batch):
                if not camera_stack:
                    camera_stack = list(cams)
                picked.append(camera_stack.pop(rng.randrange(len(camera_stack))))
            cam = stack_cameras(picked)
        else:
            if not camera_stack:
                camera_stack = list(cams)
            cam = camera_stack.pop(rng.randrange(len(camera_stack)))

        state, metrics = step_fn(state, cam, bg)
        pending.append((iteration, metrics))
        if iteration % SYNC_LAG == 0:
            # Bulk-synchronous pipelining: dispatch SYNC_LAG steps, then drain
            # all their metrics in one batched transfer (one round trip).
            consume_metrics()

        # Auto-size the instance buffer: grow BEFORE overflow starts truncating
        # splats (binning drops instances past capacity), and shrink when the
        # scene settles far below capacity — every per-instance binning cost
        # (sort, gathers, scatter, segment sums) scales with CAPACITY, not
        # live count, so an oversized buffer directly taxes the step time.
        # Both directions recompile once (compiles are cached by shape).
        # The trigger arrives SYNC_LAG iterations late; overflow in the gap
        # truncates the deepest splats for a step or two and self-heals.
        if resize_request is not None:
            kind, inst_used, it0 = resize_request
            resize_request = None
            # Headroom over the live count: every per-instance binning op
            # taxes CAPACITY, so thinner headroom buys step time directly;
            # the 0.85 grow trigger still leaves margin for camera-to-camera
            # variance (measured +-3% steady-state) before a (one-step,
            # self-healing) overflow truncation. Growth keeps the wide band;
            # stable-phase shrinks snug down (two-phase policy, PERF.md r3).
            # Large buffers round up to 64k so repeat runs hit the compile
            # cache.
            from lightgaussian_tpu.ops.rasterize.binning import MAX_CAPACITY, snug_capacity

            headroom = GROW_HEADROOM if kind == "grow" else SNUG_HEADROOM
            new_cap = snug_capacity(inst_used, headroom=headroom, quantum_small=128, floor=1024)

            if new_cap > MAX_CAPACITY:
                print(
                    f"[{iteration}] instance buffer request {new_cap} clamped "
                    f"to MAX_CAPACITY {MAX_CAPACITY} (deepest splats will be "
                    "truncated; consider the gauss-sharded parallel mode)"
                )
                new_cap = MAX_CAPACITY
            if new_cap != max_instances:
                print(
                    f"[{iteration}] instance buffer {inst_used} (at {it0}) vs "
                    f"capacity {max_instances}; {kind}ing to {new_cap} (recompile)"
                )
                max_instances = new_cap
                step_fn = make_train_step(
                    opt, scene.cameras_extent, max_instances,
                    lr_mult_fn=lr_mult_fn, update_densify_stats=densify,
                    interpret=interpret, camera_batch=camera_batch,
                )
                eval_fn = make_eval_render(max_instances, interpret=interpret)

        if iteration % 100 == 0:
            consume_metrics()
            jax.block_until_ready(state.scene.means)
            now = time.time()
            its = 100.0 / max(now - last_print_t, 1e-9)
            last_print_t = now
            print(
                f"[{iteration}/{opt.iterations}] loss={ema_loss:.5f} "
                f"alive={int(state.scene.num_alive())} {its:.1f} it/s"
            )

        # densification window (train_densify_prune.py:168-207)
        if densify and iteration < opt.densify_until_iter:
            if iteration > opt.densify_from_iter and iteration % opt.densification_interval == 0:
                size_thresh = 20 if iteration > opt.opacity_reset_interval else 0
                key, sub = jax.random.split(key)
                state, report = densify_mod.densify_and_prune(
                    state, opt.densify_grad_threshold, 0.005, scene.cameras_extent,
                    size_thresh, opt.percent_dense, sub,
                )
                # Grow Gaussian capacity before the free-slot clamp starts
                # silently dropping clones/splits. Rare: one recompile.
                cap = state.scene.capacity
                if int(state.scene.num_alive()) > 0.9 * cap:
                    new_cap = ((int(cap * 3 // 2) + 127) // 128) * 128
                    print(f"[{iteration}] gaussians near capacity {cap}; growing to {new_cap} (recompile)")
                    state = grow_capacity(state, new_cap)
            if iteration % opt.opacity_reset_interval == 0 or (
                white_background and iteration == opt.densify_from_iter
            ):
                # the white-background branch culls background-colored floaters
                # early (train_densify_prune.py:194-196)
                state = densify_mod.reset_opacity(state)

        # in-training GSS prune (train_densify_prune.py:198-205)
        if iteration in cfg.prune_iterations:
            consume_metrics()
            i = cfg.prune_iterations.index(iteration)
            percent = cfg.prune_percent * (cfg.prune_decay**i)
            print(f"[{iteration}] GSS prune {percent:.2%} (pass {i})")
            before = int(state.scene.num_alive())
            state, v_imp = gss_prune(
                state, cams, bg, percent, cfg.v_pow, max_instances, interpret,
                prune_type=prune_type,
            )
            print(f"  {before} -> {int(state.scene.num_alive())} gaussians")

        if iteration in cfg.test_iterations:
            consume_metrics()
            jax.block_until_ready(state.scene.means)
            timer.pause()
            # Strip cached SSIM moments from the train slice: eval_fn was
            # traced for stat-free test cameras, and the stats would force a
            # second eval compile + ship ~12 MB/camera of unused planes.
            train_slice = [
                c.with_gt_ssim_stats(None) if c.gt_ssim_stats is not None else c
                for c in cams[: min(5, len(cams))]
            ]
            training_report(
                logger, iteration, state.scene, eval_fn, test_cams,
                train_slice, bg, timer.total,
            )

        if iteration in cfg.save_iterations:
            timer.pause()
            print(f"[{iteration}] Saving point cloud")
            scene.save(iteration, state.scene)

        if iteration in cfg.checkpoint_iterations:
            timer.pause()
            print(f"[{iteration}] Saving checkpoint")
            ckpt_mod.save_checkpoint(
                model_path / f"chkpnt{iteration}.npz", state, iteration, scene.cameras_extent
            )
            if iteration == max(cfg.checkpoint_iterations):
                _, imp = gss.accumulate_gss_auto(state.scene, cams, bg, max_instances, interpret)
                v_imp = gss.calculate_v_imp_score(state.scene, imp, cfg.v_pow)
                save_imp_score(model_path / "imp_score.npz", state.scene, np.asarray(v_imp))

        if callbacks and callbacks.on_iteration:
            callbacks.on_iteration(iteration, state, metrics)

    consume_metrics()
    timer.pause()
    return state
