"""End-to-end training stack tests on a tiny synthetic scene (CPU, interpret
kernels): optimization drives loss down; densify/prune/reset passes keep the
fixed-capacity invariants; GSS pruning removes the least important Gaussians."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightgaussian_tpu.config import OptimizationParams
from lightgaussian_tpu.models.camera import Camera
from lightgaussian_tpu.ops.rasterize import render
from lightgaussian_tpu.train import densify, gss
from lightgaussian_tpu.train.state import init_train_state, grow_capacity
from lightgaussian_tpu.train.step import make_train_step
from lightgaussian_tpu.utils.synthetic import random_scene

BG = jnp.zeros((3,), jnp.float32)
MAX_INST = 1 << 14


def make_cams(n=3, width=64, height=64):
    cams = []
    for i in range(n):
        ang = i * 0.5
        eye = [3.0 * np.sin(ang), 0.4, -3.0 * np.cos(ang)]
        cams.append(Camera.look_at(eye=eye, target=[0, 0, 0], width=width, height=height))
    return cams


@pytest.fixture(scope="module")
def setup():
    target_scene = random_scene(n=48, seed=3, max_sh_degree=1, scale_range=(0.05, 0.15))
    cams = make_cams()
    cams = [
        c.with_gt(
            jnp.clip(
                render(target_scene, c, BG, method="tiled", interpret=True, max_instances=MAX_INST).render,
                0.0,
                1.0,
            )
        )
        for c in cams
    ]
    # student: same means slightly perturbed, re-randomized appearance
    student = random_scene(n=48, seed=4, max_sh_degree=1, scale_range=(0.05, 0.15), capacity=128)
    student = dataclasses.replace(
        student, means=student.means.at[:48].set(target_scene.means[:48] + 0.05)
    )
    return target_scene, student, cams


class TestTrainStep:
    def test_loss_decreases(self, setup):
        _, student, cams = setup
        opt = OptimizationParams(position_lr_init=0.005, position_lr_final=0.0005)
        step = make_train_step(opt, spatial_lr_scale=1.0, max_instances=MAX_INST, interpret=True)
        state = init_train_state(student)
        first = last = None
        for i in range(20):
            cam = cams[i % len(cams)]
            state, m = step(state, cam, BG)
            if first is None:
                first = float(m.loss)
            last = float(m.loss)
        assert last < first * 0.8, (first, last)
        assert int(state.step) == 20
        # densification stats accumulated
        assert float(state.denom.max()) > 0
        assert float(state.xyz_grad_accum.max()) > 0

    def test_cached_gt_ssim_stats_match_plain(self, setup):
        """A camera carrying precomputed GT SSIM moments must produce the
        same step (loss, grads -> params, densify stats) as the plain path —
        the train/loop.py staging attaches these by default."""
        from lightgaussian_tpu.ops import losses

        _, student, cams = setup
        opt = OptimizationParams()
        step = make_train_step(opt, spatial_lr_scale=1.0, max_instances=MAX_INST, interpret=True)
        state = init_train_state(student)
        cam = cams[0]
        cam_stats = cam.with_gt_ssim_stats(
            losses.precompute_ssim_target_stats(cam.gt_image)
        )
        s_plain, m_plain = step(state, cam, BG)
        s_cached, m_cached = step(state, cam_stats, BG)
        assert float(m_cached.loss) == pytest.approx(float(m_plain.loss), abs=1e-6)
        for a, b in zip(
            jax.tree.leaves(s_plain.scene.params()),
            jax.tree.leaves(s_cached.scene.params()),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(s_plain.xyz_grad_accum), np.asarray(s_cached.xyz_grad_accum),
            atol=1e-6,
        )

    def test_attach_gt_ssim_stats_budget(self, setup, capsys, monkeypatch):
        """Loop staging: auto-on within budget, auto-off (with a notice)
        above it, force-on override, no-gt cameras pass through."""
        from lightgaussian_tpu.train import loop as loop_mod

        _, _, cams = setup
        out = loop_mod._attach_gt_ssim_stats(cams, None)
        assert all(c.gt_ssim_stats is not None for c in out)
        assert out[0].gt_ssim_stats[0].shape == cams[0].gt_image.shape

        monkeypatch.setattr(loop_mod, "_GT_SSIM_CACHE_BUDGET_BYTES", 1)
        out = loop_mod._attach_gt_ssim_stats(cams, None)
        assert all(c.gt_ssim_stats is None for c in out)
        assert "disabled" in capsys.readouterr().out
        out = loop_mod._attach_gt_ssim_stats(cams, True)  # forced past budget
        assert all(c.gt_ssim_stats is not None for c in out)

        bare = [Camera.look_at(eye=[0, 0, -3], target=[0, 0, 0])]
        assert loop_mod._attach_gt_ssim_stats(bare, None)[0].gt_ssim_stats is None

    def test_frozen_fields(self, setup):
        _, student, cams = setup
        opt = OptimizationParams()
        step = make_train_step(
            opt, 1.0, MAX_INST, interpret=True,
            frozen_fields=("log_scales", "quats", "opacity_logits"),
        )
        state = init_train_state(student)
        s2, _ = step(state, cams[0], BG)
        np.testing.assert_array_equal(s2.scene.log_scales, state.scene.log_scales)
        np.testing.assert_array_equal(s2.scene.quats, state.scene.quats)
        assert not np.array_equal(s2.scene.means, state.scene.means)


class TestDensify:
    def test_densify_and_prune_invariants(self, setup):
        _, student, cams = setup
        opt = OptimizationParams(densify_grad_threshold=1e-7)
        step = make_train_step(opt, 1.0, MAX_INST, interpret=True)
        state = init_train_state(student)
        for i in range(5):
            state, _ = step(state, cams[i % len(cams)], BG)
        n0 = int(state.scene.num_alive())
        state2, report = jax.jit(
            lambda s, k: densify.densify_and_prune(s, 1e-7, 0.005, 1.0, 0, opt.percent_dense, k)
        )(state, jax.random.key(0))
        n1 = int(state2.scene.num_alive())
        assert int(report.n_cloned) + int(report.n_split) > 0
        assert n1 == int(report.n_alive)
        assert n1 > n0 - int(report.n_pruned)
        # stats reset
        assert float(state2.xyz_grad_accum.max()) == 0.0
        # moments zeroed on touched slots: newly alive slots have zero mu
        newly = np.asarray(state2.scene.alive) & ~np.asarray(state.scene.alive)
        if newly.any():
            assert np.abs(np.asarray(state2.opt.mu["means"])[newly]).max() == 0.0

    def test_capacity_overflow_drops(self, setup):
        _, student, cams = setup
        opt = OptimizationParams()
        step = make_train_step(opt, 1.0, MAX_INST, interpret=True)
        state = init_train_state(student)
        state, _ = step(state, cams[0], BG)
        # capacity 128, 48 alive, force everything hot -> clones want 48+ slots
        state = dataclasses.replace(
            state,
            xyz_grad_accum=jnp.full((128,), 1.0),
            denom=jnp.ones((128,)),
        )
        state2, report = densify.densify_and_prune(
            state, 1e-9, 0.005, 1.0, 0, 100.0, jax.random.key(1)
        )
        # percent_dense=100 -> all small -> all clones; 80 free slots, 48 wanted -> fits
        assert int(report.n_dropped) == 0
        state3 = grow_capacity(state2, 256)
        assert state3.scene.capacity == 256
        assert int(state3.scene.num_alive()) == int(state2.scene.num_alive())

    def test_reset_opacity(self, setup):
        _, student, _ = setup
        state = init_train_state(student)
        state2 = densify.reset_opacity(state)
        opa = np.asarray(state2.scene.opacities)[np.asarray(state2.scene.alive)]
        assert (opa <= 0.0101).all()
        assert np.abs(np.asarray(state2.opt.mu["opacity_logits"])).max() == 0.0


class TestGSS:
    def test_gss_prune(self, setup):
        target, _, cams = setup
        scene = random_scene(n=48, seed=3, max_sh_degree=1, scale_range=(0.05, 0.15), capacity=64)
        counts, imp = gss.accumulate_gss(scene, cams, BG, MAX_INST, interpret=True)
        assert int(np.asarray(counts).sum()) > 0
        v = gss.calculate_v_imp_score(scene, imp, v_pow=0.1)
        assert float(np.asarray(v)[np.asarray(scene.alive)].max()) > 0
        keep = gss.percentile_keep_mask(scene, v, jnp.float32(0.5))
        n_alive = int(scene.num_alive())
        n_keep = int((np.asarray(keep) & np.asarray(scene.alive)).sum())
        assert n_keep < n_alive
        assert n_keep >= int(0.3 * n_alive)
        # pruned ones have lower score than kept ones
        va = np.asarray(v)
        alive = np.asarray(scene.alive)
        kept_min = va[alive & np.asarray(keep)].min()
        dropped_max = va[alive & ~np.asarray(keep)].max()
        assert dropped_max <= kept_min


class TestLoopAutoGrow:
    """The training driver grows static capacities (with a recompile) before
    overflow silently truncates work — instance buffer and Gaussian slots."""

    def _fake_scene(self, student, cams, tmp_path):
        class FakeScene:
            cameras_extent = 1.5
            model_path = str(tmp_path)
            gaussians = student

            def getTrainCameras(self):
                return cams

            def getTestCameras(self):
                return []

            def save(self, it, sc):
                pass

        return FakeScene()

    def test_instance_buffer_grows(self, setup, tmp_path, capsys):
        from lightgaussian_tpu.config import TrainConfig
        from lightgaussian_tpu.train import loop as loop_mod
        from lightgaussian_tpu.utils.logging import MetricsLogger

        target_scene, student, cams = setup
        # Enough iterations for the async-metrics lag (loop.SYNC_LAG) to drain:
        # the resize trigger is consumed up to SYNC_LAG steps after overflow.
        cfg = TrainConfig(
            opt=OptimizationParams(iterations=12, densify_from_iter=999),
            test_iterations=[], save_iterations=[], checkpoint_iterations=[],
            prune_iterations=[],
        )
        # Start with a buffer far below the scene's real instance count.
        # Near-opaque, large splats keep the tight (alpha-support) tile rect
        # at the full 3-sigma box so the 48 Gaussians really overflow 128.
        student = dataclasses.replace(
            student,
            opacity_logits=jnp.full_like(student.opacity_logits, 6.0),
            log_scales=jnp.full_like(student.log_scales, np.log(0.3)),
        )
        loop_mod.train(
            self._fake_scene(student, cams, tmp_path), cfg, BG,
            max_instances=128, densify=False, interpret=True,
            logger=MetricsLogger(tmp_path, enable_tensorboard=False),
        )
        out = capsys.readouterr().out
        assert "growing to" in out, "instance-buffer auto-grow did not trigger"

    def test_gaussian_capacity_grows(self, setup, tmp_path, capsys):
        from lightgaussian_tpu.config import TrainConfig
        from lightgaussian_tpu.train import loop as loop_mod
        from lightgaussian_tpu.utils.logging import MetricsLogger

        target_scene, student, cams = setup
        # capacity 128 with 48 alive; aggressive densification every iter
        cfg = TrainConfig(
            opt=OptimizationParams(
                iterations=8, densify_from_iter=0, densification_interval=1,
                densify_until_iter=100, densify_grad_threshold=0.0,
                opacity_reset_interval=1000,
            ),
            test_iterations=[], save_iterations=[], checkpoint_iterations=[],
            prune_iterations=[],
        )
        state = loop_mod.train(
            self._fake_scene(student, cams, tmp_path), cfg, BG,
            max_instances=MAX_INST, densify=True, interpret=True,
            logger=MetricsLogger(tmp_path, enable_tensorboard=False),
        )
        out = capsys.readouterr().out
        assert "gaussians near capacity" in out, "capacity auto-grow did not trigger"
        assert state.scene.capacity > 128



    def test_instance_buffer_snugs_when_stable(self, setup, tmp_path, capsys):
        """Two-phase capacity policy (round 3): persistent usage below ~75%
        of capacity for 300 iterations snugs the buffer to SNUG_HEADROOM."""
        from lightgaussian_tpu.config import TrainConfig
        from lightgaussian_tpu.train import loop as loop_mod
        from lightgaussian_tpu.utils.logging import MetricsLogger

        target_scene, student, cams = setup
        cfg = TrainConfig(
            opt=OptimizationParams(iterations=320, densify_from_iter=999),
            test_iterations=[], save_iterations=[], checkpoint_iterations=[],
            prune_iterations=[],
        )
        loop_mod.train(
            self._fake_scene(student, cams, tmp_path), cfg, BG,
            max_instances=4096, densify=False, interpret=True,
            logger=MetricsLogger(tmp_path, enable_tensorboard=False),
        )
        out = capsys.readouterr().out
        assert "shrinking to" in out, "stable-phase snug shrink did not trigger"
        assert "overflow" not in out


def test_batched_step_semantics(setup):
    """camera_batch=B: ONE Adam update on the mean-over-cameras loss, with
    per-camera densification-stat accumulation identical to B independent
    single-camera steps from the same state."""
    from lightgaussian_tpu.models.camera import stack_cameras
    from lightgaussian_tpu.train import optim

    _, student, cams = setup
    opt_cfg = OptimizationParams()
    state0 = init_train_state(student)

    step_b = make_train_step(opt_cfg, 1.0, MAX_INST, interpret=True, camera_batch=2)
    batched = stack_cameras(cams[:2])
    state_b, metrics_b = step_b(state0, batched, BG)

    # reference: per-camera grads via two single-camera loss functions
    from lightgaussian_tpu.ops import losses as L

    def loss_one(params, cam):
        s = state0.scene.with_params(params)
        out = render(s, cam, BG, max_instances=MAX_INST, interpret=True)
        l1 = L.l1_loss(out.render, cam.gt_image)
        return (1 - opt_cfg.lambda_dssim) * l1 + opt_cfg.lambda_dssim * (1 - L.ssim(out.render, cam.gt_image))

    g0 = jax.grad(loss_one)(state0.scene.params(), cams[0])
    g1 = jax.grad(loss_one)(state0.scene.params(), cams[1])
    mean_g = {k: (g0[k] + g1[k]) / 2 for k in g0}
    lr_fns = optim.make_lr_fns(opt_cfg, 1.0)
    want_params, _ = optim.adam_update(
        state0.scene.params(), mean_g, state0.opt, lr_fns, state0.step,
        state0.scene.alive, 1.0,
    )
    for k in want_params:
        np.testing.assert_allclose(
            np.asarray(state_b.scene.params()[k]), np.asarray(want_params[k]),
            atol=1e-6, err_msg=f"batched Adam update differs for {k}",
        )

    # densify stats: sum of the two single-camera steps' increments
    step_1 = make_train_step(opt_cfg, 1.0, MAX_INST, interpret=True)
    sa, _ = step_1(state0, cams[0], BG)
    sb, _ = step_1(state0, cams[1], BG)
    inc_a = np.asarray(sa.xyz_grad_accum - state0.xyz_grad_accum)
    inc_b = np.asarray(sb.xyz_grad_accum - state0.xyz_grad_accum)
    inc_batched = np.asarray(state_b.xyz_grad_accum - state0.xyz_grad_accum)
    np.testing.assert_allclose(inc_batched, inc_a + inc_b, atol=1e-6)
    den_a = np.asarray(sa.denom - state0.denom)
    den_b = np.asarray(sb.denom - state0.denom)
    np.testing.assert_array_equal(np.asarray(state_b.denom - state0.denom), den_a + den_b)
    np.testing.assert_allclose(
        np.asarray(state_b.max_radii2d),
        np.maximum(np.asarray(sa.max_radii2d), np.asarray(sb.max_radii2d)),
        atol=1e-6,
    )
    assert float(metrics_b.loss) > 0


def test_lr_mult_excludes_means(setup):
    """The global ExponentialLR multiplier must not stick to the xyz group —
    the reference overwrites xyz lr from its schedule every iteration
    (`gaussian_model.py:225-231`)."""
    from lightgaussian_tpu.train import optim

    _, student, _ = setup
    opt = OptimizationParams()
    lr_fns = optim.make_lr_fns(opt, spatial_lr_scale=1.0)
    state = init_train_state(student)
    params = student.params()
    g = {k: jnp.ones_like(v) for k, v in params.items()}

    p_base, _ = optim.adam_update(params, g, state.opt, lr_fns, jnp.int32(0), student.alive, 1.0)
    p_mult, _ = optim.adam_update(params, g, state.opt, lr_fns, jnp.int32(0), student.alive, 0.5)
    np.testing.assert_array_equal(p_base["means"], p_mult["means"])
    assert not np.array_equal(p_base["sh_dc"], p_mult["sh_dc"])


def test_densify_ignores_screen_radius(setup):
    """Reference parity: big_points_vs is a no-op (postfix zeroes max_radii2D
    before the prune reads it) — a huge all-time radius must not cull, and
    max_radii2d must come out all-zero."""
    import dataclasses as dc

    from lightgaussian_tpu.train import densify

    _, student, cams = setup
    opt = OptimizationParams()
    step = make_train_step(opt, 1.0, MAX_INST, interpret=True)
    state = init_train_state(student)
    state, _ = step(state, cams[0], BG)
    state = dc.replace(state, max_radii2d=jnp.full_like(state.max_radii2d, 1e6))
    n0 = int(state.scene.num_alive())
    # extent large enough that the (legitimate) world-size prune can't fire
    state2, report = densify.densify_and_prune(
        state, 1e9, 0.0, 100.0, 20, opt.percent_dense, jax.random.key(0)
    )
    # nothing cloned/split (threshold huge), nothing pruned by the fake radii
    assert int(state2.scene.num_alive()) == n0
    assert float(state2.max_radii2d.max()) == 0.0
