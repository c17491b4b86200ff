"""Camera model: a plain pytree dataclass with precomputed view/projection.

Matrix semantics match the reference (`/root/reference/scene/cameras.py:64-85`,
`utils/graphics_utils.py:34-84`) but in standard column-vector convention
(x_cam = world_view @ x_world; clip = full_proj @ x_world). The reference stores
the transposes for its CUDA row-vector kernels; loaders here produce the same
matrices un-transposed, so numerics line up with reference checkpoints.

Width/height are static (hashable) so jit specializes per resolution; FoV tangents
are scalar array leaves so cameras can be batched/stacked for data parallelism.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(R: np.ndarray, t: np.ndarray, translate=None, scale: float = 1.0) -> np.ndarray:
    """4x4 world->camera, matching `getWorld2View2` (`graphics_utils.py:42-53`).

    `R` is the camera-to-world rotation as stored by the COLMAP loader
    (`dataset_readers.py` stores qvec2rotmat(...).T), `t` the world->camera
    translation; optional recenter/rescale of the camera center.
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else np.asarray(translate)
        C2W = np.linalg.inv(Rt)
        cam_center = (C2W[:3, 3] + translate) * scale
        C2W[:3, 3] = cam_center
        Rt = np.linalg.inv(C2W)
    return Rt.astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style perspective with z in [0, 1], matching
    `getProjectionMatrix` (`graphics_utils.py:56-76`)."""
    tan_half_y = math.tan(fovy / 2.0)
    tan_half_x = math.tan(fovx / 2.0)
    top = tan_half_y * znear
    bottom = -top
    right = tan_half_x * znear
    left = -right
    P = np.zeros((4, 4), dtype=np.float32)
    z_sign = 1.0
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = z_sign
    P[2, 2] = z_sign * zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A render-ready camera. Array fields may carry a leading batch axis."""

    world_view: jnp.ndarray  # [4, 4] world->camera
    full_proj: jnp.ndarray  # [4, 4] world->clip (= proj @ world_view)
    camera_center: jnp.ndarray  # [3]
    tan_fovx: jnp.ndarray  # scalar
    tan_fovy: jnp.ndarray  # scalar
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    # Optional ground-truth image [3, H, W] (clamped to [0,1], alpha-masked),
    # like the reference Camera's original_image (`scene/cameras.py:53-62`).
    gt_image: Any = None
    # Optional precomputed SSIM moments (B(gt), B(gt^2)) of the ground truth
    # (`losses.precompute_ssim_target_stats`): the gt never changes during
    # training, so hoisting its two blur planes out of every step's loss saves
    # 40% of the SSIM moment blur fwd AND bwd. ~12.4 MB/camera at 3x1080p.
    gt_ssim_stats: Any = None

    def with_gt(self, img: jnp.ndarray) -> "Camera":
        return dataclasses.replace(self, gt_image=jnp.asarray(img, jnp.float32))

    def with_gt_ssim_stats(self, stats) -> "Camera":
        return dataclasses.replace(self, gt_ssim_stats=stats)

    @property
    def focal_x(self) -> jnp.ndarray:
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self) -> jnp.ndarray:
        return self.height / (2.0 * self.tan_fovy)

    @classmethod
    def from_Rt(
        cls,
        R: np.ndarray,
        t: np.ndarray,
        fovx: float,
        fovy: float,
        width: int,
        height: int,
        znear: float = 0.01,
        zfar: float = 100.0,
        translate=None,
        scale: float = 1.0,
    ) -> "Camera":
        """Build from COLMAP-convention R (cam2world rotation) and T, like
        `Camera.__init__` (`scene/cameras.py:64-85`)."""
        wv = world_to_view(R, t, translate, scale)
        proj = projection_matrix(znear, zfar, fovx, fovy)
        full = proj @ wv
        cam_center = np.linalg.inv(wv)[:3, 3]
        return cls(
            world_view=jnp.asarray(wv),
            full_proj=jnp.asarray(full),
            camera_center=jnp.asarray(cam_center.astype(np.float32)),
            tan_fovx=jnp.float32(math.tan(fovx / 2.0)),
            tan_fovy=jnp.float32(math.tan(fovy / 2.0)),
            width=int(width),
            height=int(height),
        )

    @classmethod
    def look_at(
        cls,
        eye,
        target,
        up=(0.0, 1.0, 0.0),
        fovx: float = math.radians(60),
        fovy: float | None = None,
        width: int = 256,
        height: int = 256,
    ) -> "Camera":
        """Convenience constructor for tests/synthetic scenes."""
        eye = np.asarray(eye, np.float64)
        target = np.asarray(target, np.float64)
        up = np.asarray(up, np.float64)
        fwd = target - eye
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, up)
        right = right / np.linalg.norm(right)
        down = np.cross(fwd, right)
        # Camera axes as rows of world->cam rotation (x right, y down, z forward
        # — COLMAP/OpenCV convention used throughout 3D-GS).
        Rwc = np.stack([right, down, fwd], axis=0)
        t = -Rwc @ eye
        if fovy is None:
            fovy = 2.0 * math.atan(math.tan(fovx / 2.0) * height / width)
        # from_Rt expects R = cam2world rotation (loader convention).
        return cls.from_Rt(Rwc.T, t, fovx, fovy, width, height)


def stack_cameras(cams: list[Camera]) -> Camera:
    """Stack same-resolution cameras into one batched Camera pytree."""
    assert len({(c.width, c.height) for c in cams}) == 1, "mixed resolutions"
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)


def index_camera(batch: Camera, i) -> Camera:
    """Select camera i from a batched Camera (works under jit with traced i)."""
    return jax.tree.map(lambda x: x[i], batch)


def camera_count(batch: Camera) -> int:
    return int(batch.world_view.shape[0])
