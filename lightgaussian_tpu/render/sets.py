"""Batch rendering of camera sets and trajectory videos to PNG directories.

The TPU analogue of `/root/reference/render.py:25-77` (train/test stills into
`{renders,gt}/` for `metrics.py`) and `render_video.py:93-137` (ellipse /
circular / perturbed trajectories). Rendering happens through the jitted
renderer; PNG encoding stays on host.
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from lightgaussian_tpu.models.camera import Camera
from lightgaussian_tpu.models.gaussians import GaussianScene
from lightgaussian_tpu.ops.rasterize import binning as binning_mod
from lightgaussian_tpu.ops.rasterize import build_binning, render
from lightgaussian_tpu.ops.rasterize.projection import NEAR_PLANE
from lightgaussian_tpu.render import poses as pose_gen


def save_png(img, path: str | Path) -> None:
    """[3, H, W] float in [0,1] -> PNG (torchvision.utils.save_image analogue)."""
    from PIL import Image

    arr = np.asarray(jnp.clip(jnp.nan_to_num(img), 0.0, 1.0))
    arr = (arr.transpose(1, 2, 0) * 255.0 + 0.5).astype(np.uint8)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(path)


def _make_render_fn(max_instances: int, interpret: bool):
    @jax.jit
    def fn(scene: GaussianScene, camera: Camera, bg: jnp.ndarray):
        # render-only fast kernel: |delta| <= T_EPS, below PNG quantization
        return render(scene, camera, bg, max_instances=max_instances,
                      interpret=interpret, fast=True).render

    return fn


def render_set(
    model_path: str | Path,
    name: str,
    iteration: int,
    cameras: list[Camera],
    scene: GaussianScene,
    bg: jnp.ndarray,
    max_instances: int,
    interpret: bool = False,
) -> Path:
    """`render_set` (`render.py:25-41`): writes renders/ and gt/ PNGs.

    On a multi-chip backend with a single-resolution camera set, frames are
    rendered through the space-sharded strip renderer (`parallel/render.py`,
    all devices on the `space` axis) — per-strip blending is pixel-exact, so
    this changes throughput, not output (gated in tests/test_parallel.py)."""
    base = Path(model_path) / name / f"ours_{iteration}"
    renders_dir = base / "renders"
    gt_dir = base / "gt"
    one_res = len({(c.width, c.height) for c in cameras}) <= 1
    if len(jax.devices()) > 1 and one_res and cameras:
        from lightgaussian_tpu.parallel import parallel_render

        images = parallel_render(
            scene, cameras, bg, max_instances=max_instances, interpret=interpret
        )
        for idx, (img, cam) in enumerate(zip(images, cameras)):
            save_png(img, renders_dir / f"{idx:05d}.png")
            if cam.gt_image is not None:
                save_png(cam.gt_image, gt_dir / f"{idx:05d}.png")
        return base
    fn = _make_render_fn(max_instances, interpret)
    for idx, cam in enumerate(cameras):
        img = fn(scene, cam, bg)
        save_png(img, renders_dir / f"{idx:05d}.png")
        if cam.gt_image is not None:
            save_png(cam.gt_image, gt_dir / f"{idx:05d}.png")
    return base


def _make_cached_render_fn(interpret: bool):
    @jax.jit
    def fn(scene: GaussianScene, camera: Camera, bg: jnp.ndarray, binning):
        return render(scene, camera, bg, cached_binning=binning,
                      interpret=interpret, fast=True).render

    return fn


def _sample_means(scene: GaussianScene, k: int = 4096) -> np.ndarray:
    """Deterministic subset of alive Gaussian centers for host-side drift
    estimation."""
    means = np.asarray(scene.means)
    idx = np.flatnonzero(np.asarray(scene.alive))
    if idx.size == 0:
        idx = np.arange(means.shape[0])
    if idx.size > k:
        idx = np.random.default_rng(0).choice(idx, size=k, replace=False)
    return means[idx]


def _project_np(means: np.ndarray, cam: Camera):
    """Host-side mirror of projection.preprocess's screen mapping: world ->
    clip (full_proj) -> NDC -> pixel centers, plus camera-space depth."""
    fp = np.asarray(cam.full_proj)
    wv = np.asarray(cam.world_view)
    ph = means @ fp[:3, :3].T + fp[:3, 3]
    pw = means @ fp[3, :3] + fp[3, 3]
    ndc = ph[:, :2] / (pw[:, None] + 1e-7)
    size = np.array([cam.width, cam.height], np.float64)
    xy = ((ndc + 1.0) * size - 1.0) * 0.5
    z = means @ wv[2, :3] + wv[2, 3]
    return xy, z


def plan_rebin_schedule(
    scene: GaussianScene,
    frames: list[Camera],
    rebin_every: int,
    drift_px: float,
    sample: int = 4096,
    margin: float = 64.0,
) -> list[bool]:
    """Keyframe plan for cached-binning reuse, gated on MEASURED splat drift.

    Frame i rebins iff the maximum screen-space displacement (pixels) of a
    sampled in-frustum subset of splats since the last keyframe exceeds
    `drift_px`, or `rebin_every` frames have elapsed (upper bound). This
    replaces the round-2/3 camera-angle/travel proxy (4.8 deg / 2%), which
    measured the CAMERA's motion, not the splats': fine-splat scenes blew
    through it and cost ~20-27 dB on worst reused frames (PERF.md round 3).
    Drift <= ~1 px is harmless by construction — `tile_rect` pads every
    splat's tile footprint by +1 px, so the stale (tile | depth) ranges still
    cover the support and blending uses fresh features; beyond that, splats
    start crossing tile boundaries their cached ranges don't cover.

    All decisions are host-side numpy over the whole trajectory (cameras are
    known upfront), so the gate costs zero device round-trips per frame.
    Depth-ORDER staleness is not separately gated: reorder artifacts appear
    at screen drifts far above the pixel gate on real trajectories.
    """
    means = _sample_means(scene, sample)
    proj = [_project_np(means, c) for c in frames]
    flags = [True]
    key = 0
    for i in range(1, len(frames)):
        xy0, z0 = proj[key]
        xy1, z1 = proj[i]
        w, h = frames[i].width, frames[i].height
        vis = (
            (z0 > NEAR_PLANE) & (z1 > NEAR_PLANE)
            & (xy0[:, 0] > -margin) & (xy0[:, 0] < w + margin)
            & (xy0[:, 1] > -margin) & (xy0[:, 1] < h + margin)
        )
        if vis.any():
            drift = float(np.linalg.norm(xy1[vis] - xy0[vis], axis=1).max())
        else:
            drift = np.inf  # nothing trackable: don't trust the cache
        if (i - key) >= rebin_every or drift > drift_px:
            flags.append(True)
            key = i
        else:
            flags.append(False)
    return flags


def render_trajectory(
    model_path: str | Path,
    kind: str,
    iteration: int,
    cameras: list[Camera],
    scene: GaussianScene,
    bg: jnp.ndarray,
    max_instances: int,
    n_frames: int = 600,
    radius: float = 0.5,
    interpret: bool = False,
    rebin_every: int = 8,  # UPPER BOUND between keyframes; the real gate is
                           # measured splat drift (plan_rebin_schedule)
    drift_px: float = 1.5,  # max screen drift before a rebin; <=1 px is
                            # covered by tile_rect's +1 px footprint margin
) -> Path:
    """Trajectory renders (`render_video.py:93-137`): kind in
    {"ellipse", "circular", "spherical", "spherify", "spiral"}; frames into
    `<kind>/ours_<it>/`."""
    out_name = {"ellipse": "video", "circular": "circular",
                "spherical": "spherical", "spherify": "spherify",
                "spiral": "spiral"}[kind]
    base = Path(model_path) / out_name / f"ours_{iteration}"
    fn = _make_render_fn(max_instances, interpret)
    template = cameras[0]

    if kind == "ellipse":
        w2cs = pose_gen.generate_ellipse_path(cameras, n_frames=n_frames)
        frames = [pose_gen.camera_from_w2c(p, template) for p in w2cs]
    elif kind == "spherical":
        w2cs = pose_gen.generate_spherical_sample_path(cameras, n=n_frames)
        frames = [pose_gen.camera_from_w2c(p, template) for p in w2cs]
    elif kind == "spherify":
        w2cs = pose_gen.generate_spherify_path(cameras, n_frames=n_frames)
        frames = [pose_gen.camera_from_w2c(p, template) for p in w2cs]
    elif kind == "spiral":
        w2cs = pose_gen.generate_spiral_path_focal(cameras, n_frames=n_frames)
        frames = [pose_gen.camera_from_w2c(p, template) for p in w2cs]
    else:
        ref_cam = cameras[min(13, len(cameras) - 1)]
        frames = [
            pose_gen.circular_pose(ref_cam, radius, 2.0 * np.pi * i / n_frames)
            for i in range(n_frames)
        ]

    if len(jax.devices()) > 1:
        # Multi-chip: render every frame fresh through the space-sharded
        # strip renderer (parallel/render.py) — strips scale with chips and
        # each frame is exact, so the single-chip drift-gated reuse
        # machinery below (whose caches are per-device) is not needed.
        from lightgaussian_tpu.parallel import parallel_render

        images = parallel_render(
            scene, frames, bg, max_instances=max_instances, interpret=interpret
        )
        for idx, img in enumerate(images):
            save_png(img, base / f"{idx:05d}.png")
        return base

    if rebin_every <= 1:
        for idx, cam in enumerate(frames):
            save_png(fn(scene, cam, bg), base / f"{idx:05d}.png")
        return base

    # Temporal binning reuse: nearby trajectory cameras share a valid
    # (tile | depth) sort order, so keyframes bin fresh and in-between frames
    # only re-gather features (skips ~60% of binning; deltas quantified in
    # tests/test_temporal_binning and PERF.md). Reuse is gated on MEASURED
    # splat drift (plan_rebin_schedule): the round-2/3 camera-angle proxy let
    # fine-splat scenes reuse binnings whose splats had moved many pixels,
    # costing ~20-27 dB on worst reused frames. With the pixel gate, fast
    # trajectories (e.g. the default 600-frame orbit at 1080p, ~4-14 px
    # drift/frame) simply rebin every frame — quality-first — while slow
    # segments keep the reuse win automatically. The instance buffer is
    # right-sized from the first frame's live count (the default heuristic
    # over-allocates ~3x).
    def make_bin_fn(cap):
        return jax.jit(lambda s, c: build_binning(s, c, max_instances=cap))

    cap = max_instances
    bin_fn = make_bin_fn(cap)
    cached_fn = _make_cached_render_fn(interpret)
    binning = bin_fn(scene, frames[0])
    snug = min(binning_mod.snug_capacity(int(binning.total), headroom=1.35), cap)
    if snug < 0.75 * cap:
        cap = snug
        bin_fn = make_bin_fn(cap)
        binning = bin_fn(scene, frames[0])

    rebin = plan_rebin_schedule(scene, frames, rebin_every, drift_px)
    # A keyframe whose binning is never reused (the next frame rebins too —
    # e.g. every frame of a fast trajectory) renders through the FUSED fresh
    # path: one jit call instead of bin_fn + cached blend, which avoids an
    # HBM round trip of the binning buffers (~20% faster when the gate
    # degenerates to rebin-1; measured scripts/bench_render_fps.py).
    n = len(frames)
    reused = [idx + 1 < n and not rebin[idx + 1] for idx in range(n)]

    def make_fresh_fn(c):
        # returns (image, total) so the fused path keeps the overflow check
        @jax.jit
        def fn(scene, cam, bg):
            out = render(scene, cam, bg, max_instances=c,
                         interpret=interpret, fast=True)
            return out.render, out.num_instances

        return fn

    def grow(total, cam, want_binning):
        nonlocal cap, bin_fn, fresh_fn
        new_cap = min(binning_mod.snug_capacity(total, headroom=1.35),
                      max_instances)
        if new_cap != cap:
            cap = new_cap
            bin_fn = make_bin_fn(cap)
            fresh_fn = make_fresh_fn(cap)
        return bin_fn(scene, cam) if want_binning else None

    fresh_fn = make_fresh_fn(cap)
    for idx, cam in enumerate(frames):
        if rebin[idx] and not reused[idx]:
            img, total = fresh_fn(scene, cam, bg)
            if int(total) >= cap:  # denser view: grow capacity, re-render
                grow(int(total), cam, want_binning=False)
                img, total = fresh_fn(scene, cam, bg)
            save_png(img, base / f"{idx:05d}.png")
            continue
        if idx > 0 and rebin[idx]:
            binning = bin_fn(scene, cam)
            total = int(binning.total)
            if total >= cap:  # trajectory drifted into denser views: grow back
                binning = grow(total, cam, want_binning=True) or binning
        save_png(cached_fn(scene, cam, bg, binning), base / f"{idx:05d}.png")
    return base
