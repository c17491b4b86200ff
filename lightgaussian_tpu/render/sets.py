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
        return render(scene, camera, bg, max_instances=max_instances, interpret=interpret).render

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
    """`render_set` (`render.py:25-41`): writes renders/ and gt/ PNGs."""
    base = Path(model_path) / name / f"ours_{iteration}"
    renders_dir = base / "renders"
    gt_dir = base / "gt"
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
                      interpret=interpret).render

    return fn


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
    rebin_every: int = 4,  # on-chip 300k/1080p: worst reused frame 27.4 dB
                           # vs fresh at 4 (19.9 dB at 8) for ~5% FPS
                           # (PERF.md round 3); 1 = fresh every frame
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

    if rebin_every <= 1:
        for idx, cam in enumerate(frames):
            save_png(fn(scene, cam, bg), base / f"{idx:05d}.png")
        return base

    # Temporal binning reuse: nearby trajectory cameras share a valid
    # (tile | depth) sort order, so keyframes bin fresh and in-between frames
    # only re-gather features (skips ~60% of binning; deltas quantified in
    # tests/test_temporal_binning and PERF.md). Reuse is gated on ACTUAL
    # camera motion since the keyframe — a fixed frame count corrupts coarse
    # trajectories (36-degree spherical-path jumps, short orbits); gate is
    # ~4.8 deg / 2% travel. Fidelity depends on splat size relative to the
    # per-frame drift: small interpret-mode scenes stay >55 dB for 8 reused
    # frames, but an on-chip 300k fine-splat scene at 1080p measures worst
    # reused frames of 27.4 dB (rebin 4) / 19.9 dB (rebin 8) vs fresh
    # (PERF.md round 3) — hence the rebin-4 default and the rebin-1 escape
    # hatch for export. `rebin_every` is the upper bound between keyframes.
    # The instance
    # buffer is right-sized from the first frame's live count (the default
    # heuristic over-allocates ~3x).
    def cam_drift(a: Camera, b: Camera) -> tuple[float, float]:
        ra = np.asarray(a.world_view)[:3, :3]
        rb = np.asarray(b.world_view)[:3, :3]
        cosang = (np.trace(ra @ rb.T) - 1.0) / 2.0
        ang = float(np.degrees(np.arccos(np.clip(cosang, -1.0, 1.0))))
        ca, cb = np.asarray(a.camera_center), np.asarray(b.camera_center)
        trans = float(np.linalg.norm(ca - cb) / (np.linalg.norm(ca) + 1e-9))
        return ang, trans

    MAX_ANGLE_DEG, MAX_TRAVEL = 4.8, 0.02

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

    key_cam, since_key = frames[0], 0
    for idx, cam in enumerate(frames):
        ang, trans = cam_drift(key_cam, cam)
        if idx > 0 and (since_key >= rebin_every or ang > MAX_ANGLE_DEG
                        or trans > MAX_TRAVEL):
            binning = bin_fn(scene, cam)
            key_cam, since_key = cam, 0
            total = int(binning.total)
            if total >= cap:  # trajectory drifted into denser views: grow back
                new_cap = min(binning_mod.snug_capacity(total, headroom=1.35),
                              max_instances)
                if new_cap != cap:
                    cap = new_cap
                    bin_fn = make_bin_fn(cap)
                    binning = bin_fn(scene, cam)
        since_key += 1
        save_png(cached_fn(scene, cam, bg, binning), base / f"{idx:05d}.png")
    return base
