"""Quaternion / scaling -> 3D covariance builders, and the EWA 2D projection.

Semantics match the reference's covariance construction
(`/root/reference/utils/general_utils.py:84-119`: R from (unnormalized) quaternion,
L = R @ diag(s), Sigma = L @ L^T stored as upper-triangular 6-vector) and the
standard 3D-GS EWA splat (project Sigma through the Jacobian of the perspective
map; reconstructed contract of the non-vendored CUDA rasterizer, SURVEY.md §2.1a).

Everything is vectorized over the leading Gaussian axis — pure VPU work under jit.
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized quaternion [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3].

    Normalizes internally like the reference (`general_utils.py:84-107`).
    """
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def build_covariance_3d(scales: jnp.ndarray, quats: jnp.ndarray, scale_modifier: float = 1.0) -> jnp.ndarray:
    """(scales [...,3], quats [...,4]) -> full symmetric covariance [..., 3, 3].

    Sigma = R S S^T R^T with S = diag(scale_modifier * scales)
    (`general_utils.py:110-119`).
    """
    R = quat_to_rotmat(quats)
    L = R * (scale_modifier * scales)[..., None, :]  # R @ diag(s)
    # L @ L^T written out component-wise: exact f32 elementwise VPU work that
    # XLA fuses away. A dot_general here either runs in bf16 (default matmul
    # precision) or, forced to f32, lowers to a ~3 ms un-fused batched matmul.
    rows = [L[..., i, :] for i in range(3)]  # each [..., 3]
    out = [[jnp.sum(rows[i] * rows[j], axis=-1) for j in range(3)] for i in range(3)]
    return jnp.stack(
        [jnp.stack(r, axis=-1) for r in out], axis=-2
    )


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """Full [..., 3, 3] -> upper-tri 6-vector (xx, xy, xz, yy, yz, zz)
    (`general_utils.py:68-81`)."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def unstrip_symmetric(c6: jnp.ndarray) -> jnp.ndarray:
    """Upper-tri 6-vector -> full symmetric [..., 3, 3]."""
    xx, xy, xz, yy, yz, zz = (c6[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )


def ewa_project(
    means_cam: jnp.ndarray,
    cov3d: jnp.ndarray,
    focal_x: float,
    focal_y: float,
    tan_fovx: float,
    tan_fovy: float,
) -> jnp.ndarray:
    """EWA splat: camera-space covariance -> 2D screen covariance [..., 3] (a, b, c).

    Sigma2D = J Sigma_cam J^T with J the Jacobian of the perspective projection,
    camera-space x/y clamped to 1.3x the frustum half-angles for J stability, and
    +0.3 added to the diagonal as the standard 3D-GS low-pass filter. `cov3d` here
    is already rotated into camera space by the caller (W Sigma W^T).

    Returns (cov_xx, cov_xy, cov_yy) stacked on the last axis.
    """
    tx, ty, tz = means_cam[..., 0], means_cam[..., 1], means_cam[..., 2]
    tz = jnp.maximum(tz, 1e-6)
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    txz = jnp.clip(tx / tz, -limx, limx) * tz
    tyz = jnp.clip(ty / tz, -limy, limy) * tz

    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz
    # J rows: [fx/tz, 0, -fx*tx/tz^2], [0, fy/tz, -fy*ty/tz^2]
    j00 = focal_x * inv_tz
    j02 = -focal_x * txz * inv_tz2
    j11 = focal_y * inv_tz
    j12 = -focal_y * tyz * inv_tz2

    c = cov3d  # [..., 3, 3] in camera space
    # Sigma2D = J C J^T, expanded (J has zeros at (0,1) and (1,0)).
    a = j00 * (j00 * c[..., 0, 0] + j02 * c[..., 2, 0]) + j02 * (
        j00 * c[..., 0, 2] + j02 * c[..., 2, 2]
    )
    b = j11 * (j00 * c[..., 0, 1] + j02 * c[..., 2, 1]) + j12 * (
        j00 * c[..., 0, 2] + j02 * c[..., 2, 2]
    )
    d = j11 * (j11 * c[..., 1, 1] + j12 * c[..., 2, 1]) + j12 * (
        j11 * c[..., 1, 2] + j12 * c[..., 2, 2]
    )
    return jnp.stack([a + 0.3, b, d + 0.3], axis=-1)
