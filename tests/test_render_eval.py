"""Tests for trajectory generation, batch rendering, metrics (incl. LPIPS),
the metric.csv logger, and the SH distillation step."""
import json
import math

import jax.numpy as jnp
import numpy as np
import pytest

from lightgaussian_tpu.config import OptimizationParams
import lightgaussian_tpu.eval.lpips as lpips_mod
import lightgaussian_tpu.eval.metrics as metrics_mod
from lightgaussian_tpu.models.camera import Camera
from lightgaussian_tpu.ops.rasterize import render
from lightgaussian_tpu.render import poses as pose_gen
from lightgaussian_tpu.render import sets as render_sets
from lightgaussian_tpu.train import distill
from lightgaussian_tpu.train.state import init_train_state
from lightgaussian_tpu.utils import logging as log_mod
from lightgaussian_tpu.utils.synthetic import random_scene

MAXI = 1 << 17


def _ring_cameras(n=8, dist=2.5, width=64, height=48):
    return [
        Camera.look_at(
            (dist * math.cos(t), 0.4, dist * math.sin(t)), (0, 0, 0),
            fovx=0.9, width=width, height=height,
        )
        for t in np.linspace(0, 2 * np.pi, n, endpoint=False)
    ]


# ---------------------------------------------------------------------------
# Pose generation
# ---------------------------------------------------------------------------

def test_camera_Rt_roundtrip():
    cam = Camera.look_at((1.0, 2.0, 3.0), (0, 0, 0), width=32, height=32)
    R, T = pose_gen.camera_Rt(cam)
    rebuilt = Camera.from_Rt(R, T, 0.9, 0.9, 32, 32)
    np.testing.assert_allclose(
        np.asarray(rebuilt.world_view), np.asarray(cam.world_view), atol=1e-5
    )


def test_ellipse_path_geometry():
    cams = _ring_cameras(12)
    w2cs = pose_gen.generate_ellipse_path(cams, n_frames=40)
    assert len(w2cs) == 40
    for w2c in w2cs[:5]:
        R = w2c[:3, :3]
        # like the reference, the PCA un-normalization leaves a uniform scale
        # on the rotation block (harmless under perspective division); the
        # normalized block must be orthonormal
        s = np.linalg.det(R) ** (1.0 / 3.0)
        Rn = R / s
        np.testing.assert_allclose(Rn @ Rn.T, np.eye(3), atol=1e-5)
        # camera center orbits within the training ring's ballpark
        center = np.linalg.inv(w2c)[:3, 3]
        assert 0.5 < np.linalg.norm(center) < 8.0


def test_ellipse_path_frames_renderable():
    cams = _ring_cameras(8)
    scene = random_scene(n=100, seed=0, extent=0.8, scale_range=(0.03, 0.1))
    w2cs = pose_gen.generate_ellipse_path(cams, n_frames=4)
    frame = pose_gen.camera_from_w2c(w2cs[0], cams[0])
    out = render(scene, frame, jnp.zeros(3), max_instances=MAXI, interpret=True)
    assert float(out.render.max()) > 0.01  # scene is visible from path


def test_spherical_path():
    cams = _ring_cameras(8)
    w2cs = pose_gen.generate_spherical_sample_path(cams, n=6)
    assert len(w2cs) == 6
    for w2c in w2cs:
        R = w2c[:3, :3]
        s = np.abs(np.linalg.det(R)) ** (1.0 / 3.0)
        np.testing.assert_allclose((R / s) @ (R / s).T, np.eye(3), atol=1e-5)


def test_spiral_path():
    cams = _ring_cameras(8)
    w2cs = pose_gen.generate_spiral_path(cams, bounds=np.array([1.0, 10.0]), n_frames=6)
    assert w2cs.shape == (6, 4, 4)


def test_spiral_path_focal():
    """Second spiral variant (`pose_utils.py:518-551`): flat FoV-derived orbit."""
    cams = _ring_cameras(8)
    w2cs = pose_gen.generate_spiral_path_focal(cams, n_frames=12)
    assert w2cs.shape == (12, 4, 4)
    centers = []
    for w2c in w2cs:
        R = w2c[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        centers.append(np.linalg.inv(w2c)[:3, 3])
    centers = np.stack(centers)
    # zrate=0, one rotation: a closed flat loop inside the camera rig's extent
    assert np.linalg.norm(centers[0] - centers[-1]) < np.linalg.norm(centers[0] - centers[6])
    assert np.abs(centers).max() < 2 * 2.5 + 1.0


def test_spherify_path():
    cams = _ring_cameras(10)
    w2cs = pose_gen.generate_spherify_path(cams, n_frames=8)
    assert len(w2cs) == 8
    centers = []
    for w2c in w2cs:
        R = w2c[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        centers.append(np.linalg.inv(w2c)[:3, 3])
    # circle at roughly constant radius from the rig's focus (the origin)
    radii = np.linalg.norm(np.stack(centers), axis=1)
    np.testing.assert_allclose(radii, radii[0], rtol=0.05)
    assert 0.5 < radii[0] < 8.0
    # frames actually see the scene
    scene = random_scene(n=100, seed=0, extent=0.8, scale_range=(0.03, 0.1))
    frame = pose_gen.camera_from_w2c(w2cs[0], cams[0])
    out = render(scene, frame, jnp.zeros(3), max_instances=MAXI, interpret=True)
    assert float(out.render.max()) > 0.01


def test_gaussian_pose_jitter():
    rng = np.random.default_rng(0)
    cam = _ring_cameras(1)[0].with_gt(jnp.zeros((3, 48, 64)))
    jit_cam = pose_gen.gaussian_pose(cam, rng)
    # small perturbation: matrices close but not equal
    d = np.abs(np.asarray(jit_cam.world_view) - np.asarray(cam.world_view)).max()
    assert 1e-6 < d < 0.3
    assert jit_cam.gt_image is not None
    assert (jit_cam.width, jit_cam.height) == (cam.width, cam.height)


def test_circular_pose_offsets_center():
    cam = _ring_cameras(1)[0]
    moved = pose_gen.circular_pose(cam, radius=0.5, angle=0.3)
    d = np.linalg.norm(np.asarray(moved.camera_center) - np.asarray(cam.camera_center))
    assert abs(d - 0.5) < 1e-5


# ---------------------------------------------------------------------------
# LPIPS + metrics
# ---------------------------------------------------------------------------

def test_lpips_basic_properties(rng):
    params = lpips_mod.random_lpips_params(seed=0)
    a = jnp.asarray(rng.random((3, 32, 32)), jnp.float32)
    b = jnp.asarray(rng.random((3, 32, 32)), jnp.float32)
    assert float(lpips_mod.lpips(params, a, a)) < 1e-10
    assert float(lpips_mod.lpips(params, a, b)) > 1e-4
    # more-similar pair scores lower
    a_noisy = jnp.clip(a + 0.05 * jnp.asarray(rng.standard_normal((3, 32, 32))), 0, 1)
    assert float(lpips_mod.lpips(params, a, a_noisy)) < float(lpips_mod.lpips(params, a, b))


def test_lpips_weight_roundtrip(tmp_path, rng):
    """convert_torch_lpips output must load and match the architecture."""
    vgg_state, lin_state = {}, {}
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    c_in = 3
    blocks = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
    flat = [c for c, n in blocks for _ in range(n)]
    for lid, c_out in zip(conv_ids, flat):
        vgg_state[f"{lid}.weight"] = rng.normal(size=(c_out, c_in, 3, 3)).astype(np.float32)
        vgg_state[f"{lid}.bias"] = rng.normal(size=(c_out,)).astype(np.float32)
        c_in = c_out
    for s, (c, _) in enumerate(blocks):
        lin_state[f"lin{s}.model.1.weight"] = rng.random((1, c, 1, 1)).astype(np.float32)
    lpips_mod.convert_torch_lpips(vgg_state, lin_state, tmp_path / "w.npz")
    params = lpips_mod.load_lpips_params(tmp_path / "w.npz")
    assert params.kind == "vgg-pretrained"
    a = jnp.asarray(rng.random((3, 16, 16)), jnp.float32)
    assert float(lpips_mod.lpips(params, a, a)) < 1e-10


def _synthetic_pretrained_npz(path, rng):
    """A weights file in the converted-pretrained format (the layout
    `convert_torch_lpips` emits from torchvision VGG16 + richzhang lin
    state dicts, `/root/reference/lpipsPyTorch/modules/utils.py:12-33`)."""
    vgg_state, lin_state = {}, {}
    conv_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    c_in = 3
    blocks = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
    flat = [c for c, n in blocks for _ in range(n)]
    for lid, c_out in zip(conv_ids, flat):
        vgg_state[f"{lid}.weight"] = (
            rng.normal(size=(c_out, c_in, 3, 3)).astype(np.float32) * 0.1
        )
        vgg_state[f"{lid}.bias"] = rng.normal(size=(c_out,)).astype(np.float32) * 0.01
        c_in = c_out
    for s, (c, _) in enumerate(blocks):
        lin_state[f"lin{s}.model.1.weight"] = rng.random((1, c, 1, 1)).astype(np.float32)
    lpips_mod.convert_torch_lpips(vgg_state, lin_state, path)
    return path


def test_metrics_consume_pretrained_lpips_weights(tmp_path, rng):
    """The day real LPIPS weights arrive, nothing new needs writing: a
    weights file in the pretrained format must flow through get_lpips_params
    -> evaluate_method_dir, flip `lpips_kind` to vgg-pretrained, and change
    the scores vs the seeded-random fallback (VERDICT r4 item 5)."""
    npz = _synthetic_pretrained_npz(tmp_path / "lpips_vgg.npz", rng)

    scene = random_scene(n=120, seed=2, extent=0.8, scale_range=(0.03, 0.1))
    bg = jnp.zeros(3)
    cams = _ring_cameras(2)
    gt_cams = []
    for i, c in enumerate(cams):
        img = render(scene, c, bg, max_instances=MAXI, interpret=True).render
        # perturb the gt so LPIPS is non-zero and weight-sensitive
        noise = 0.05 * jnp.asarray(rng.random(img.shape), jnp.float32)
        gt_cams.append(c.with_gt(jnp.clip(img + noise, 0, 1)))
    base = render_sets.render_set(
        tmp_path, "test", 3, gt_cams, scene, bg, MAXI, interpret=True
    )

    params = lpips_mod.get_lpips_params(npz)
    assert params.kind == "vgg-pretrained"
    means_pre, _ = metrics_mod.evaluate_method_dir(base, lpips_params=params)
    assert means_pre["lpips_kind"] == "vgg-pretrained"

    means_rand, _ = metrics_mod.evaluate_method_dir(base)
    assert means_rand["lpips_kind"] == "vgg-random"
    assert means_pre["LPIPS"] > 0
    assert means_pre["LPIPS"] != pytest.approx(means_rand["LPIPS"], rel=1e-3)
    # non-perceptual metrics are weight-independent
    assert means_pre["PSNR"] == pytest.approx(means_rand["PSNR"], abs=1e-9)

    # the full results.json path honors an explicit weights file too
    metrics_mod.evaluate_model_paths([tmp_path], lpips_weights=npz)
    saved = json.loads((tmp_path / "results.json").read_text())
    assert saved["ours_3"]["lpips_kind"] == "vgg-pretrained"


def test_render_set_and_metrics(tmp_path):
    scene = random_scene(n=150, seed=0, extent=0.8, scale_range=(0.03, 0.1))
    bg = jnp.zeros(3)
    cams = _ring_cameras(3)
    # attach each camera's own render as gt -> metrics should be perfect
    gt_cams = []
    for c in cams:
        img = render(scene, c, bg, max_instances=MAXI, interpret=True).render
        gt_cams.append(c.with_gt(jnp.clip(img, 0, 1)))

    base = render_sets.render_set(tmp_path, "test", 7, gt_cams, scene, bg, MAXI, interpret=True)
    assert sorted(p.name for p in (base / "renders").iterdir()) == ["00000.png", "00001.png", "00002.png"]
    means, per_view = metrics_mod.evaluate_method_dir(base)
    assert means["PSNR"] > 45  # only 8-bit PNG quantization error
    assert means["SSIM"] > 0.99
    assert len(per_view["PSNR"]) == 3

    results = metrics_mod.evaluate_model_paths([tmp_path])
    assert (tmp_path / "results.json").exists()
    saved = json.loads((tmp_path / "results.json").read_text())
    assert "ours_7" in saved


def test_render_trajectory_writes_frames(tmp_path):
    scene = random_scene(n=100, seed=1, extent=0.8, scale_range=(0.03, 0.1))
    cams = _ring_cameras(8)
    base = render_sets.render_trajectory(
        tmp_path, "ellipse", 3, cams, scene, jnp.zeros(3), MAXI, n_frames=4, interpret=True
    )
    assert len(list(base.iterdir())) == 4


def test_render_set_mixed_resolution_falls_back(tmp_path):
    """A camera set with more than one resolution cannot share the
    space-sharded renderer's one compiled program — render_set must fall back
    to the per-camera single-device path and still write every frame."""
    scene = random_scene(n=100, seed=4, extent=0.8, scale_range=(0.03, 0.1))
    bg = jnp.zeros(3)
    cams = _ring_cameras(2)
    cams.append(_ring_cameras(1, width=48, height=32)[0])
    gt_cams = []
    for c in cams:
        img = render(scene, c, bg, max_instances=MAXI, interpret=True).render
        gt_cams.append(c.with_gt(jnp.clip(img, 0, 1)))
    base = render_sets.render_set(
        tmp_path, "mixed", 1, gt_cams, scene, bg, MAXI, interpret=True
    )
    names = sorted(p.name for p in (base / "renders").iterdir())
    assert names == ["00000.png", "00001.png", "00002.png"]
    means, _ = metrics_mod.evaluate_method_dir(base)
    assert means["PSNR"] > 45  # renders still match their own gt per camera


def test_render_trajectory_multidevice_matches_fresh(tmp_path):
    """The multi-device dispatch (sets.py: space-sharded strip renderer,
    every frame fresh) must write the same frames, in the same order, as a
    direct single-device render of the same pose list — pins the pose/
    ordering/gt-stripping plumbing, not just the strip math (which
    test_parallel gates at 1e-5)."""
    import jax
    from PIL import Image

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device backend (8 virtual CPU devices)")
    scene = random_scene(n=120, seed=2, extent=0.8, scale_range=(0.03, 0.1))
    cams = _ring_cameras(8)
    bg = jnp.zeros(3)
    base = render_sets.render_trajectory(
        tmp_path, "ellipse", 3, cams, scene, bg, MAXI, n_frames=3, interpret=True
    )
    # Reproduce the deterministic pose list and render each frame on the
    # single-device path.
    w2cs = pose_gen.generate_ellipse_path(cams, n_frames=3)
    for idx, w2c in enumerate(w2cs):
        cam = pose_gen.camera_from_w2c(w2c, cams[0])
        ref = np.clip(np.asarray(
            render(scene, cam, bg, max_instances=MAXI, interpret=True).render
        ), 0.0, 1.0)
        got = np.asarray(
            Image.open(base / f"{idx:05d}.png"), dtype=np.float32
        ).transpose(2, 0, 1) / 255.0
        # exact up to 8-bit PNG quantization (+1 LSB for f32 regrouping at
        # strip seams)
        assert np.abs(got - ref).max() <= 1.6 / 255.0


# ---------------------------------------------------------------------------
# Logging
# ---------------------------------------------------------------------------

def test_metrics_logger_csv(tmp_path):
    logger = log_mod.MetricsLogger(tmp_path, enable_tensorboard=False)
    logger.csv_row(100, "test", 0.05, 25.0, 0.9, 0.1, 12.5, 60.0)
    logger.csv_row(200, "train", 0.04, 26.0, 0.91, 0.09, 12.5, 120.0)
    rows = (tmp_path / "metric.csv").read_text().strip().split("\n")
    assert rows[0].split(",") == log_mod.CSV_FIELDS
    assert "lpips_kind" in log_mod.CSV_FIELDS  # fallback scores must be tagged
    assert len(rows) == 3
    assert rows[1].startswith("100,test,0.05")
    assert rows[1].split(",")[6] == "vgg-random"  # default when untagged


def test_metrics_logger_schema_migration(tmp_path):
    """Appending into a metric.csv with an OLD header must not misalign rows;
    the legacy file is parked and a fresh one started."""
    old_header = "iteration,set,l1_loss,psnr,ssim,lpips,file_size,elapsed"
    (tmp_path / "metric.csv").write_text(old_header + "\n1,test,0.1,20,0.8,0.1,0,1\n")
    logger = log_mod.MetricsLogger(tmp_path, enable_tensorboard=False)
    logger.csv_row(2, "test", 0.05, 25.0, 0.9, 0.1, 12.5, 60.0)
    rows = (tmp_path / "metric.csv").read_text().strip().split("\n")
    assert rows[0].split(",") == log_mod.CSV_FIELDS
    assert len(rows) == 2  # header + the new row only
    assert (tmp_path / "metric_legacy.csv").read_text().startswith(old_header)


def test_training_report(tmp_path):
    scene = random_scene(n=100, seed=2, extent=0.8, scale_range=(0.03, 0.1))
    bg = jnp.zeros(3)
    cams = _ring_cameras(2)
    gt_cams = [
        c.with_gt(jnp.clip(render(scene, c, bg, max_instances=MAXI, interpret=True).render, 0, 1))
        for c in cams
    ]
    from lightgaussian_tpu.train.step import make_eval_render

    ev = make_eval_render(max_instances=MAXI, interpret=True)
    logger = log_mod.MetricsLogger(tmp_path, enable_tensorboard=False)
    results = log_mod.training_report(
        logger, 50, scene, ev, gt_cams, gt_cams[:1], bg, elapsed_s=3.0
    )
    assert results["test"]["psnr"] > 40
    rows = (tmp_path / "metric.csv").read_text().strip().split("\n")
    assert len(rows) == 3  # header + test + train
    # no pretrained weights on this box: rows must carry the vgg-random tag so
    # fallback scores can never masquerade as real LPIPS
    import csv as _csv

    for r in _csv.DictReader(open(tmp_path / "metric.csv")):
        assert r["lpips_kind"] == "vgg-random"


# ---------------------------------------------------------------------------
# Distillation
# ---------------------------------------------------------------------------

def test_distill_truncates_and_improves():
    import dataclasses

    teacher = random_scene(n=200, seed=3, extent=0.8, scale_range=(0.03, 0.1), active_sh_degree=3)
    # amplify view-dependent color so degree truncation visibly hurts
    teacher = dataclasses.replace(teacher, sh_rest=teacher.sh_rest * 6.0)
    student_scene = distill.init_student(teacher, new_sh_degree=2)
    assert student_scene.max_sh_degree == 2
    assert student_scene.sh_rest.shape[1] == 8

    bg = jnp.zeros(3)
    cams = _ring_cameras(4)
    step = distill.make_distill_step(
        OptimizationParams(), spatial_lr_scale=1.0, max_instances=MAXI, interpret=True
    )
    state = init_train_state(student_scene)
    losses_seq = []
    for i in range(16):
        state, m = step(state, teacher, cams[i % 4], bg)
        losses_seq.append(float(m.loss))
    # same-camera-set epoch means: last epoch must beat the first
    assert np.mean(losses_seq[-4:]) < np.mean(losses_seq[:4])

    # frozen fields unchanged
    for f in ("log_scales", "quats", "opacity_logits"):
        np.testing.assert_array_equal(
            np.asarray(getattr(state.scene, f)), np.asarray(getattr(student_scene, f))
        )
    # trained fields did move
    assert np.abs(np.asarray(state.scene.sh_dc) - np.asarray(student_scene.sh_dc)).max() > 0


def test_exponential_lr_mult():
    fn = distill.exponential_lr_mult(0.9, 500)
    assert float(fn(jnp.int32(0))) == 1.0
    assert abs(float(fn(jnp.int32(500))) - 0.9) < 1e-6
    assert abs(float(fn(jnp.int32(1500))) - 0.9**3) < 1e-6
