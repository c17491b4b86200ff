"""Unit tests for the math layer: SH, covariance, losses, schedules, KNN, camera."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightgaussian_tpu.models import camera as cam_mod
from lightgaussian_tpu.ops import covariance as cov_ops
from lightgaussian_tpu.ops import knn, losses
from lightgaussian_tpu.ops import sh as sh_ops
from lightgaussian_tpu.utils import general


class TestSH:
    def test_degree0_is_constant(self, rng):
        sh = jnp.asarray(rng.normal(size=(5, 16, 3)), jnp.float32)
        dirs = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = sh_ops.eval_sh(0, sh, dirs)
        np.testing.assert_allclose(out, sh_ops.C0 * sh[:, 0, :], rtol=1e-6)

    def test_rgb_sh_roundtrip(self, rng):
        rgb = jnp.asarray(rng.uniform(size=(10, 3)), jnp.float32)
        np.testing.assert_allclose(
            sh_ops.sh_dc_to_rgb(sh_ops.rgb_to_sh(rgb)), rgb, rtol=1e-5, atol=1e-6
        )

    @pytest.mark.parametrize("degree", [1, 2, 3, 4])
    def test_matches_scipy_real_sh(self, degree, rng):
        """Each band must span the same function space as scipy's real SH:
        project a random degree-d SH expansion on many directions and check
        the integral identity sum_lm |c_lm|^2 via least squares recovery."""
        from scipy.special import sph_harm_y

        k = (degree + 1) ** 2
        coeffs = rng.normal(size=(1, k, 1)).astype(np.float32)
        dirs = rng.normal(size=(200, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        ours = np.asarray(
            sh_ops.eval_sh(degree, jnp.tile(jnp.asarray(coeffs), (200, 1, 1)), jnp.asarray(dirs))
        )[:, 0]

        # Build the real SH basis matrix from scipy (theta=polar from +z).
        theta = np.arccos(np.clip(dirs[:, 2], -1, 1))
        phi = np.arctan2(dirs[:, 1], dirs[:, 0])
        basis = []
        for l in range(degree + 1):
            for m in range(-l, l + 1):
                y = sph_harm_y(l, abs(m), theta, phi)
                if m < 0:
                    basis.append(np.sqrt(2) * (-1) ** m * y.imag)
                elif m == 0:
                    basis.append(y.real)
                else:
                    basis.append(np.sqrt(2) * (-1) ** m * y.real)
        B = np.stack(basis, axis=1)  # [200, k]
        # ours must lie in the span of B: residual of lstsq ~ 0
        sol, *_ = np.linalg.lstsq(B, ours, rcond=None)
        recon = B @ sol
        np.testing.assert_allclose(recon, ours, atol=1e-4)


class TestCovariance:
    def test_quat_identity(self):
        R = cov_ops.quat_to_rotmat(jnp.array([1.0, 0.0, 0.0, 0.0]))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_quat_orthonormal(self, rng):
        q = jnp.asarray(rng.normal(size=(50, 4)), jnp.float32)
        R = cov_ops.quat_to_rotmat(q)
        eye = jnp.matmul(R, jnp.swapaxes(R, -1, -2))
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (50, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), np.ones(50), atol=1e-5)

    def test_quat_90deg_z(self):
        # 90 deg around z: w = cos(45), z = sin(45)
        s = math.sqrt(0.5)
        R = np.asarray(cov_ops.quat_to_rotmat(jnp.array([s, 0.0, 0.0, s])))
        np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)

    def test_covariance_psd_and_eigvals(self, rng):
        scales = jnp.asarray(rng.uniform(0.5, 2.0, size=(20, 3)), jnp.float32)
        quats = jnp.asarray(rng.normal(size=(20, 4)), jnp.float32)
        cov = cov_ops.build_covariance_3d(scales, quats)
        np.testing.assert_allclose(cov, np.swapaxes(np.asarray(cov), -1, -2), atol=1e-5)
        evals = np.linalg.eigvalsh(np.asarray(cov))
        np.testing.assert_allclose(
            np.sort(evals, -1), np.sort(np.asarray(scales) ** 2, -1), rtol=1e-3
        )

    def test_strip_roundtrip(self, rng):
        scales = jnp.asarray(rng.uniform(0.5, 2.0, size=(4, 3)), jnp.float32)
        quats = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)
        cov = cov_ops.build_covariance_3d(scales, quats)
        np.testing.assert_allclose(
            cov_ops.unstrip_symmetric(cov_ops.strip_symmetric(cov)), cov, atol=1e-6
        )

    def test_ewa_matches_dense_jacobian(self, rng):
        """EWA closed form == J @ C @ J^T with the dense 2x3 Jacobian."""
        n = 16
        means = np.stack(
            [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(2, 6, n)], -1
        ).astype(np.float32)
        scales = jnp.asarray(rng.uniform(0.05, 0.2, size=(n, 3)), jnp.float32)
        quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
        cov = np.asarray(cov_ops.build_covariance_3d(scales, quats))
        fx, fy, tfx, tfy = 300.0, 310.0, 1.0, 0.9
        out = np.asarray(
            cov_ops.ewa_project(jnp.asarray(means), jnp.asarray(cov), fx, fy, tfx, tfy)
        )
        for i in range(n):
            tx, ty, tz = means[i]
            # inside frustum limits for this test (|tx/tz| < 1.3 etc.)
            J = np.array(
                [[fx / tz, 0, -fx * tx / tz**2], [0, fy / tz, -fy * ty / tz**2]]
            )
            s = J @ cov[i] @ J.T
            np.testing.assert_allclose(out[i, 0], s[0, 0] + 0.3, rtol=1e-3, atol=1e-4)
            np.testing.assert_allclose(out[i, 1], s[0, 1], rtol=1e-3, atol=1e-4)
            np.testing.assert_allclose(out[i, 2], s[1, 1] + 0.3, rtol=1e-3, atol=1e-4)


class TestLosses:
    def test_ssim_self_is_one(self, rng):
        img = jnp.asarray(rng.uniform(size=(3, 32, 32)), jnp.float32)
        assert float(losses.ssim(img, img)) == pytest.approx(1.0, abs=1e-4)

    def test_ssim_decreases_with_noise(self, rng):
        img = jnp.asarray(rng.uniform(size=(3, 32, 32)), jnp.float32)
        noisy = img + 0.2 * jnp.asarray(rng.normal(size=(3, 32, 32)), jnp.float32)
        assert float(losses.ssim(img, noisy)) < 0.9

    def test_ssim_matches_torch_reference_impl(self, rng):
        """Cross-check against an independent torch implementation with the
        reference's exact conv/padding semantics (loss_utils.py:26-85)."""
        import torch
        import torch.nn.functional as F

        img1 = rng.uniform(size=(3, 24, 24)).astype(np.float32)
        img2 = rng.uniform(size=(3, 24, 24)).astype(np.float32)

        # independent torch impl
        g = torch.exp(
            -((torch.arange(11, dtype=torch.float32) - 5) ** 2) / (2 * 1.5**2)
        )
        g = g / g.sum()
        win = (g[:, None] @ g[None, :]).expand(3, 1, 11, 11).contiguous()
        t1, t2 = torch.tensor(img1)[None], torch.tensor(img2)[None]
        mu1 = F.conv2d(t1, win, padding=5, groups=3)
        mu2 = F.conv2d(t2, win, padding=5, groups=3)
        s11 = F.conv2d(t1 * t1, win, padding=5, groups=3) - mu1**2
        s22 = F.conv2d(t2 * t2, win, padding=5, groups=3) - mu2**2
        s12 = F.conv2d(t1 * t2, win, padding=5, groups=3) - mu1 * mu2
        c1, c2 = 0.01**2, 0.03**2
        smap = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1**2 + mu2**2 + c1) * (s11 + s22 + c2)
        )
        expected = float(smap.mean())

        ours = float(losses.ssim(jnp.asarray(img1), jnp.asarray(img2)))
        assert ours == pytest.approx(expected, abs=1e-5)

    def test_psnr(self):
        a = jnp.zeros((3, 8, 8))
        b = jnp.full((3, 8, 8), 0.1)
        assert float(losses.psnr(a, b)) == pytest.approx(20.0, abs=1e-4)

    def test_pallas_blur_matches_jnp(self, rng):
        """The fused TPU blur kernel (interpret mode) vs the jnp reference,
        including non-aligned shapes and the 15-channel SSIM stack."""
        for c, h, w in [(15, 37, 53), (3, 64, 96), (1, 8, 8)]:
            x = jnp.asarray(rng.uniform(size=(c, h, w)), jnp.float32)
            ref = losses._blur_jnp(x, 11, 1.5)
            pal = losses._blur_pallas_raw(x, 11, 1.5, interpret=True)
            np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-6)

    def test_pallas_blur_self_adjoint_vjp(self, rng):
        """blur's custom VJP (blur itself) vs autodiff through the jnp path."""
        x = jnp.asarray(rng.uniform(size=(3, 24, 40)), jnp.float32)
        wgt = jnp.asarray(rng.normal(size=(3, 24, 40)), jnp.float32)
        blur = losses._blur_self_adjoint(11, 1.5, True)
        g_pal = jax.grad(lambda v: (blur(v) * wgt).sum())(x)
        g_ref = jax.grad(lambda v: (losses._blur_jnp(v, 11, 1.5) * wgt).sum())(x)
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), atol=1e-5)


class TestSchedules:
    def test_expon_lr_endpoints(self):
        f = general.expon_lr_schedule(1.6e-4, 1.6e-6, max_steps=30_000)
        assert float(f(0)) == pytest.approx(1.6e-4, rel=1e-5)
        assert float(f(30_000)) == pytest.approx(1.6e-6, rel=1e-5)
        assert float(f(15_000)) == pytest.approx(math.sqrt(1.6e-4 * 1.6e-6), rel=1e-4)
        assert float(f(-1)) == 0.0

    def test_gamma_decay(self):
        f = general.exponential_decay_every(0.95, 400)
        assert float(f(399)) == pytest.approx(1.0)
        assert float(f(400)) == pytest.approx(0.95)
        assert float(f(1200)) == pytest.approx(0.95**3, rel=1e-5)


class TestKNN:
    def test_windowed_close_to_exact(self, rng):
        pts = jnp.asarray(rng.normal(size=(500, 3)), jnp.float32)
        approx = knn.mean_sq_dist_to_3nn(pts, window=32)
        exact = knn.mean_sq_dist_to_3nn_exact(pts)
        # Morton-window search is approximate (so is the CUDA reference's
        # box search); demand near-exact agreement in bulk, bounded tail.
        rel_err = np.abs(np.asarray(approx) - np.asarray(exact)) / np.asarray(exact)
        assert np.median(rel_err) < 0.01
        assert np.mean(rel_err < 0.1) > 0.7
        # subset property: windowed candidates can only overestimate
        assert np.all(np.asarray(approx) >= np.asarray(exact) - 1e-6)

    def test_grid_points_exactness(self):
        # On a regular grid the 3 nearest neighbors are at unit distance.
        g = np.stack(np.meshgrid(*[np.arange(5.0)] * 3), -1).reshape(-1, 3)
        out = np.asarray(knn.mean_sq_dist_to_3nn(jnp.asarray(g, jnp.float32), window=32))
        assert np.allclose(out, 1.0, atol=1e-5)


class TestCamera:
    def test_projection_matrix_corners(self):
        fovx, fovy = math.radians(60), math.radians(45)
        P = cam_mod.projection_matrix(0.01, 100.0, fovx, fovy)
        # A point on the frustum edge at z=1 maps to ndc x=1.
        x = math.tan(fovx / 2)
        clip = P @ np.array([x, 0, 1.0, 1.0])
        assert clip[0] / clip[3] == pytest.approx(1.0, abs=1e-5)

    def test_look_at_center(self):
        cam = cam_mod.Camera.look_at(eye=[0, 0, -5], target=[0, 0, 0], width=100, height=80)
        p = np.array([0.0, 0.0, 0.0, 1.0])
        clip = np.asarray(cam.full_proj) @ p
        ndc = clip[:3] / clip[3]
        assert abs(ndc[0]) < 1e-5 and abs(ndc[1]) < 1e-5
        # camera center recovered
        np.testing.assert_allclose(np.asarray(cam.camera_center), [0, 0, -5], atol=1e-5)

    def test_world_to_view_depth_positive_forward(self):
        cam = cam_mod.Camera.look_at(eye=[1, 2, -5], target=[1, 2, 0])
        p_view = np.asarray(cam.world_view) @ np.array([1.0, 2.0, 0.0, 1.0])
        assert p_view[2] == pytest.approx(5.0, abs=1e-5)

    def test_stack_and_index(self):
        cams = [
            cam_mod.Camera.look_at(eye=[0, 0, -5], target=[0, 0, 0]),
            cam_mod.Camera.look_at(eye=[0, 1, -5], target=[0, 0, 0]),
        ]
        batch = cam_mod.stack_cameras(cams)
        assert batch.world_view.shape == (2, 4, 4)
        c1 = cam_mod.index_camera(batch, 1)
        np.testing.assert_allclose(c1.world_view, cams[1].world_view)


class TestFusedSSIMMoments:
    """The TPU-fused SSIM moment kernel (`losses._ssim_moments_fused`) must
    match the jnp stacked-blur path in values and in gradients (its VJP is
    hand-written from blur self-adjointness)."""

    def _ssim_via_fused(self, a, b):
        m = losses._ssim_moments_fused(11, 1.5, True)(a, b)
        c = a.shape[0]
        m = m.reshape(c, 5, *a.shape[1:])
        mu1, mu2, s11, s22, s12 = m[:, 0], m[:, 1], m[:, 2], m[:, 3], m[:, 4]
        c1, c2 = 0.01**2, 0.03**2
        smap = ((2 * mu1 * mu2 + c1) * (2 * (s12 - mu1 * mu2) + c2)) / (
            (mu1 * mu1 + mu2 * mu2 + c1)
            * ((s11 - mu1 * mu1) + (s22 - mu2 * mu2) + c2)
        )
        return smap.mean()

    def test_fused_moments_match_jnp_path(self, rng):
        x = jnp.asarray(rng.uniform(size=(3, 41, 67)), jnp.float32)
        y = jnp.asarray(rng.uniform(size=(3, 41, 67)), jnp.float32)
        ref = float(losses.ssim(x, y))  # CPU backend -> jnp path
        fused = float(self._ssim_via_fused(x, y))
        assert fused == pytest.approx(ref, abs=1e-6)

    def test_fused_moments_gradients(self, rng):
        x = jnp.asarray(rng.uniform(size=(3, 33, 48)), jnp.float32)
        y = jnp.asarray(rng.uniform(size=(3, 33, 48)), jnp.float32)
        g_ref = jax.grad(lambda a, b: losses.ssim(a, b), argnums=(0, 1))(x, y)
        g_fus = jax.grad(self._ssim_via_fused, argnums=(0, 1))(x, y)
        for r, f in zip(g_ref, g_fus):
            scale = float(jnp.max(jnp.abs(r))) + 1e-12
            np.testing.assert_allclose(
                np.asarray(f) / scale, np.asarray(r) / scale, atol=1e-5
            )


class TestCachedTargetSSIM:
    """`ssim(..., target_stats=...)` (cached-GT-moments training path) must
    equal the plain 5-plane path in value and in d/d(img1), on both the jnp
    fallback and the fused 3-plane Pallas kernel (interpret mode)."""

    def _ssim_via_fused_xside(self, a, b, stats):
        m = losses._ssim_moments_fused_xside(11, 1.5, True)(a, b)
        c = a.shape[0]
        m = m.reshape(c, 3, *a.shape[1:])
        mu1, s11, s12 = m[:, 0], m[:, 1], m[:, 2]
        mu2, s22 = stats
        c1, c2 = 0.01**2, 0.03**2
        smap = ((2 * mu1 * mu2 + c1) * (2 * (s12 - mu1 * mu2) + c2)) / (
            (mu1 * mu1 + mu2 * mu2 + c1)
            * ((s11 - mu1 * mu1) + (s22 - mu2 * mu2) + c2)
        )
        return smap.mean()

    def test_value_matches_plain_path(self, rng):
        x = jnp.asarray(rng.uniform(size=(3, 41, 67)), jnp.float32)
        y = jnp.asarray(rng.uniform(size=(3, 41, 67)), jnp.float32)
        stats = losses.precompute_ssim_target_stats(y)
        ref = float(losses.ssim(x, y))
        cached = float(losses.ssim(x, y, target_stats=stats))
        assert cached == pytest.approx(ref, abs=1e-6)
        fused = float(self._ssim_via_fused_xside(x, y, stats))
        assert fused == pytest.approx(ref, abs=1e-6)

    def test_grad_img1_matches_plain_path(self, rng):
        x = jnp.asarray(rng.uniform(size=(3, 33, 48)), jnp.float32)
        y = jnp.asarray(rng.uniform(size=(3, 33, 48)), jnp.float32)
        stats = losses.precompute_ssim_target_stats(y)
        g_ref = jax.grad(lambda a: losses.ssim(a, y))(x)
        g_cached = jax.grad(lambda a: losses.ssim(a, y, target_stats=stats))(x)
        g_fused = jax.grad(lambda a: self._ssim_via_fused_xside(a, y, stats))(x)
        scale = float(jnp.max(jnp.abs(g_ref))) + 1e-12
        for g in (g_cached, g_fused):
            np.testing.assert_allclose(
                np.asarray(g) / scale, np.asarray(g_ref) / scale, atol=1e-5
            )

    def test_gs_loss_threading(self, rng):
        x = jnp.asarray(rng.uniform(size=(3, 24, 32)), jnp.float32)
        y = jnp.asarray(rng.uniform(size=(3, 24, 32)), jnp.float32)
        stats = losses.precompute_ssim_target_stats(y)
        ref = float(losses.gs_loss(x, y))
        cached = float(losses.gs_loss(x, y, target_stats=stats))
        assert cached == pytest.approx(ref, abs=1e-6)


def test_masked_losses():
    import numpy as np
    from lightgaussian_tpu.ops import losses

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((3, 8, 8)).astype(np.float32))
    y = jnp.asarray(rng.random((3, 8, 8)).astype(np.float32))
    m = jnp.asarray((rng.random((3, 8, 8)) > 0.5).astype(np.float32))
    # mask=None degenerates to the unmasked means
    assert float(losses.masked_mse(x, y)) == pytest.approx(float(losses.mse(x, y)))
    assert float(losses.masked_mae(x, y)) == pytest.approx(float(losses.l1_loss(x, y)))
    # reference formula: sum((x*m - y*m)^2) / (sum(m) + 1e-5)
    d = np.asarray(x) * np.asarray(m) - np.asarray(y) * np.asarray(m)
    want = (d**2).sum() / (np.asarray(m).sum() + 1e-5)
    assert float(losses.masked_mse(x, y, m)) == pytest.approx(float(want), rel=1e-5)
    want = np.abs(d).sum() / (np.asarray(m).sum() + 1e-5)
    assert float(losses.masked_mae(x, y, m)) == pytest.approx(float(want), rel=1e-5)
