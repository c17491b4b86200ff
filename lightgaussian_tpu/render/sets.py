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
from lightgaussian_tpu.ops.rasterize import render
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

    for idx, cam in enumerate(frames):
        save_png(fn(scene, cam, bg), base / f"{idx:05d}.png")
    return base
