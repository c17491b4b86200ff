"""Per-Gaussian preprocess: frustum cull, EWA projection, conic, radius, SH color.

This is the vectorized (pure-jnp, autodiff-friendly) equivalent of the CUDA
rasterizer's `preprocess` stage (reconstructed contract in SURVEY.md §2.1a —
the reference submodule is Inria's diff-gaussian-rasterization fork, called from
`/root/reference/gaussian_renderer/__init__.py:76-115`). It is elementwise over
N Gaussians, so XLA fuses it into a handful of VPU loops; only the blend stage
needs a hand-written kernel.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from lightgaussian_tpu.models.camera import Camera
from lightgaussian_tpu.models.gaussians import GaussianScene
from lightgaussian_tpu.ops import covariance as cov_ops
from lightgaussian_tpu.ops import sh as sh_ops

NEAR_PLANE = 0.2  # CUDA reference culls p_view.z <= 0.2
ALPHA_EPS = 1.0 / 255.0  # min alpha to blend
T_EPS = 1e-4  # transmittance early-stop threshold
MAX_ALPHA = 0.99


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Splats:
    """Screen-space Gaussians ready for blending."""

    mean2d: jnp.ndarray  # [N, 2] pixel coords
    conic: jnp.ndarray  # [N, 3] inverse 2D covariance (a, b, c)
    color: jnp.ndarray  # [N, 3] RGB
    opacity: jnp.ndarray  # [N]
    depth: jnp.ndarray  # [N] camera-space z
    radius: jnp.ndarray  # [N] int32 pixel radius (0 = culled)


def preprocess(
    scene: GaussianScene,
    camera: Camera,
    scale_modifier: float = 1.0,
    mean2d_offset: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
) -> Splats:
    """Project all Gaussians to screen space.

    `mean2d_offset` ([N, 2], NDC units) is an all-zeros dummy whose gradient is
    the screen-space positional gradient used for densification — the JAX-native
    version of the reference's `viewspace_points` trick
    (`gaussian_renderer/__init__.py:37-46`). Gradients w.r.t. it carry the
    0.5*W / 0.5*H NDC->pixel factors, matching the CUDA backward's scaling.

    `colors_precomp` / `cov3d_precomp` mirror the reference's optional
    Python-side overrides (`gaussian_renderer/__init__.py:76-103`).
    """
    means = scene.means
    n = means.shape[0]
    wv = camera.world_view
    fp = camera.full_proj

    # World -> camera. K=3 "matmuls" are written as broadcasted elementwise
    # sums: exact f32 (XLA's default TPU matmul precision is bf16, which
    # visibly corrupts the projection) and fully fusible on the VPU.
    def matvec3(m3):  # rows [3(+), 3] applied to means -> [N, 3(+)]
        return jnp.sum(means[:, None, :] * m3[None, :, :], axis=-1)

    p_view = matvec3(wv[:3, :3]) + wv[:3, 3]
    depth = p_view[:, 2]

    # World -> clip -> NDC -> pixels.
    p_hom = matvec3(fp[:3, :3]) + fp[:3, 3]
    p_w = jnp.sum(means * fp[3, :3], axis=-1) + fp[3, 3]
    inv_w = 1.0 / (p_w + 1e-7)
    ndc = p_hom[:, :2] * inv_w[:, None]
    if mean2d_offset is not None:
        ndc = ndc + mean2d_offset
    size = jnp.array([camera.width, camera.height], jnp.float32)
    mean2d = ((ndc + 1.0) * size - 1.0) * 0.5

    # 3D covariance -> camera frame -> EWA 2D covariance.
    if cov3d_precomp is not None:
        cov3d = cov_ops.unstrip_symmetric(cov3d_precomp)
    else:
        cov3d = cov_ops.build_covariance_3d(scene.scales, scene.quats, scale_modifier)
    Wr = wv[:3, :3]
    # W @ Sigma @ W^T component-wise (exact f32, fusible; see matvec3 note).
    tmp = jnp.sum(Wr[None, :, None, :] * cov3d[:, None, :, :], axis=-1)  # [N,3,3]
    cov_cam = jnp.sum(tmp[:, :, None, :] * Wr[None, None, :, :], axis=-1)
    focal_x = camera.width / (2.0 * camera.tan_fovx)
    focal_y = camera.height / (2.0 * camera.tan_fovy)
    cov2d = cov_ops.ewa_project(
        p_view, cov_cam, focal_x, focal_y, camera.tan_fovx, camera.tan_fovy
    )
    a, b, c = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2]
    det = a * c - b * b
    det_valid = det > 0.0
    inv_det = jnp.where(det_valid, 1.0 / jnp.where(det_valid, det, 1.0), 0.0)
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    # Pixel radius from the larger eigenvalue (3 sigma), like the CUDA preprocess.
    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    # View-dependent color.
    if colors_precomp is not None:
        color = colors_precomp
    else:
        dirs = means - camera.camera_center
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
        color = sh_ops.sh_to_rgb(scene.active_sh_degree, scene.sh_coeffs, dirs)

    valid = scene.alive & (depth > NEAR_PLANE) & det_valid
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    opacity = jnp.where(valid, scene.opacities, 0.0)

    return Splats(
        mean2d=mean2d,
        conic=conic,
        color=color,
        opacity=opacity,
        depth=jnp.where(valid, depth, jnp.inf),
        radius=radius,
    )
