"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh (conftest sets
XLA_FLAGS=--xla_force_host_platform_device_count=8).

Checks that the (data, space)-sharded train step is numerically equivalent to
sequential single-chip steps over the same camera batch (grads are pmean'd over
cameras, so the single-chip oracle averages grads before one Adam update)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightgaussian_tpu.config import OptimizationParams
from lightgaussian_tpu.models.camera import Camera, stack_cameras
from lightgaussian_tpu.ops import losses
from lightgaussian_tpu.ops.rasterize import render
from lightgaussian_tpu.parallel import make_mesh, make_parallel_train_step
from lightgaussian_tpu.train import optim
from lightgaussian_tpu.train.state import init_train_state
from lightgaussian_tpu.utils.synthetic import default_camera, random_scene

H, W = 64, 96
MAX_INST = 8192


def _make_batch(n_cams, with_gt=True):
    scene = random_scene(n=128, seed=3, capacity=256)
    bg = jnp.zeros((3,), jnp.float32)
    cams = []
    for i in range(n_cams):
        ang = 2 * np.pi * i / n_cams
        cam = Camera.look_at(
            eye=[3.5 * np.sin(ang), -0.3, -3.5 * np.cos(ang)],
            target=[0, 0, 0], width=W, height=H,
        )
        if with_gt:
            gt = render(scene, cam, bg, max_instances=MAX_INST, interpret=True).render
            cam = cam.with_gt(jnp.clip(gt, 0, 1))
        cams.append(cam)
    return scene, cams, bg


def _oracle_step(state, cams, bg, opt_cfg):
    """Single-device reference: average grads over the camera batch, one Adam
    update (what the sharded step computes with pmean over 'data')."""
    lr_fns = optim.make_lr_fns(opt_cfg, 1.0)

    def loss_fn(params):
        s = state.scene.with_params(params)
        total = 0.0
        for cam in cams:
            out = render(s, cam, bg, max_instances=MAX_INST, interpret=True)
            l1 = losses.l1_loss(out.render, cam.gt_image)
            ssim_v = losses.ssim(out.render, cam.gt_image)
            total += (1 - opt_cfg.lambda_dssim) * l1 + opt_cfg.lambda_dssim * (1 - ssim_v)
        return total / len(cams)

    grads = jax.grad(loss_fn)(state.scene.params())
    new_params, new_opt = optim.adam_update(
        state.scene.params(), grads, state.opt, lr_fns, state.step,
        state.scene.alive, 1.0,
    )
    return new_params


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 2), (8, 1), (1, 2)])
def test_parallel_step_matches_sequential(mesh_shape):
    data, space = mesh_shape
    student = random_scene(n=96, seed=7, capacity=128)
    gt_scene, cams, bg = _make_batch(data)
    batch = stack_cameras(cams)
    opt_cfg = OptimizationParams()

    mesh = make_mesh(data=data, space=space)
    step = make_parallel_train_step(
        opt_cfg, 1.0, max_instances=MAX_INST, mesh=mesh, image_height=H,
        interpret=True,
    )
    state = init_train_state(student)
    new_state, metrics = step(state, batch, bg)

    ref_params = _oracle_step(init_train_state(student), cams, bg, opt_cfg)
    got = new_state.scene.params()
    for k in ref_params:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref_params[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"param {k} mismatch for mesh {mesh_shape}",
        )
    assert jnp.isfinite(metrics.loss)
    assert int(new_state.step) == 1


def test_parallel_step_cached_gt_ssim_matches_plain():
    """Cameras carrying precomputed GT SSIM moments through the (data, space)
    step must produce the same update as the plain path (the loop staging
    attaches these by default)."""
    from lightgaussian_tpu.ops import losses as losses_mod

    data, space = 2, 2
    student = random_scene(n=96, seed=7, capacity=128)
    _, cams, bg = _make_batch(data)
    cams_stats = [
        c.with_gt_ssim_stats(losses_mod.precompute_ssim_target_stats(c.gt_image))
        for c in cams
    ]
    opt_cfg = OptimizationParams()
    mesh = make_mesh(data=data, space=space)
    step = make_parallel_train_step(
        opt_cfg, 1.0, max_instances=MAX_INST, mesh=mesh, image_height=H,
        interpret=True,
    )
    state = init_train_state(student)
    s_plain, m_plain = step(state, stack_cameras(cams), bg)
    s_cached, m_cached = step(state, stack_cameras(cams_stats), bg)
    np.testing.assert_allclose(float(m_cached.loss), float(m_plain.loss), atol=1e-6)
    a, b = s_plain.scene.params(), s_cached.scene.params()
    for k in a:
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), atol=1e-6, err_msg=f"param {k}"
        )


def test_parallel_loss_decreases_over_steps():
    data, space = 4, 2
    student = random_scene(n=96, seed=11, capacity=128)
    _, cams, bg = _make_batch(data)
    batch = stack_cameras(cams)
    mesh = make_mesh(data=data, space=space)
    step = make_parallel_train_step(
        OptimizationParams(), 1.0, max_instances=MAX_INST, mesh=mesh,
        image_height=H, interpret=True,
    )
    state = init_train_state(student)
    first = last = None
    for _ in range(10):
        state, m = step(state, batch, bg)
        if first is None:
            first = float(m.loss)
        last = float(m.loss)
    assert last < first


@pytest.mark.parametrize("mesh_shape,n_cams", [((4, 2), 4), ((8, 1), 5), ((2, 1), 7)])
def test_sharded_gss_matches_sequential(mesh_shape, n_cams):
    """Camera-parallel GSS sweep (psum of per-Gaussian accumulators over
    `data`) vs the sequential per-camera loop — the reference's prune_list
    (`prune.py:133-157`). Counts are integer-exact; importance sums only
    regroup f32 additions across cameras. Includes non-divisible camera
    counts (padding cameras weighted 0)."""
    from lightgaussian_tpu.parallel.gss import accumulate_gss_sharded
    from lightgaussian_tpu.train.gss import accumulate_gss

    data, space = mesh_shape
    scene, cams, bg = _make_batch(n_cams)

    counts_seq, imp_seq = accumulate_gss(scene, cams, bg, MAX_INST, interpret=True)

    mesh = make_mesh(data=data, space=space)
    counts_sh, imp_sh = accumulate_gss_sharded(
        mesh, scene, cams, bg, MAX_INST, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(counts_sh), np.asarray(counts_seq))
    np.testing.assert_allclose(
        np.asarray(imp_sh), np.asarray(imp_seq), rtol=1e-5, atol=1e-5
    )
    assert int(np.asarray(counts_seq).sum()) > 0, "vacuous sweep"


@pytest.mark.parametrize("mesh_shape", [(1, 2), (2, 2), (1, 8)])
def test_parallel_render_matches_single_device(mesh_shape):
    """The standalone space-sharded inference render (parallel/render.py):
    per-chip tile-row strips all_gathered into full frames must match the
    single-device render of the same cameras — the multi-chip counterpart of
    the reference's pure-render paths (render.py:43, render_video.py:107)."""
    from lightgaussian_tpu.parallel import make_parallel_render

    data, space = mesh_shape
    scene, cams, bg = _make_batch(data, with_gt=False)
    mesh = make_mesh(data=data, space=space)

    for fast in (False, True):
        fn = make_parallel_render(
            mesh, W, H, max_instances=MAX_INST, interpret=True, fast=fast
        )
        images, final_t = fn(scene, stack_cameras(cams), bg)
        assert images.shape == (data, 3, H, W)
        assert final_t.shape == (data, H, W)
        for i, cam in enumerate(cams):
            ref = render(
                scene, cam, bg, max_instances=MAX_INST, interpret=True, fast=fast
            )
            np.testing.assert_allclose(
                np.asarray(images[i]), np.asarray(ref.render), atol=1e-5,
                err_msg=f"mesh {mesh_shape} fast={fast} camera {i}",
            )
            np.testing.assert_allclose(
                np.asarray(final_t[i]), np.asarray(ref.final_T), atol=1e-5,
                err_msg=f"mesh {mesh_shape} fast={fast} camera {i} final_T",
            )


def test_parallel_render_odd_height():
    """Heights not divisible by the space axis: the last shard renders a
    short ceil-strip and the gathered frame is cropped — must still match
    single-device exactly."""
    from lightgaussian_tpu.parallel import make_parallel_render

    h, w = 41, 96
    scene = random_scene(n=128, seed=3, capacity=256)
    bg = jnp.zeros((3,), jnp.float32)
    cam = Camera.look_at(eye=[0.5, -0.3, -3.5], target=[0, 0, 0], width=w, height=h)
    mesh = make_mesh(data=1, space=8)
    fn = make_parallel_render(mesh, w, h, max_instances=MAX_INST, interpret=True)
    images, final_t = fn(scene, stack_cameras([cam]), bg)
    assert images.shape == (1, 3, h, w)
    ref = render(scene, cam, bg, max_instances=MAX_INST, interpret=True, fast=True)
    np.testing.assert_allclose(np.asarray(images[0]), np.asarray(ref.render), atol=1e-5)
    np.testing.assert_allclose(np.asarray(final_t[0]), np.asarray(ref.final_T), atol=1e-5)


def test_parallel_render_list_padding():
    """`parallel_render` over a camera list not divisible by the data axis:
    padded frames are dropped and every returned frame matches single-device."""
    from lightgaussian_tpu.parallel import parallel_render

    scene, cams, bg = _make_batch(3, with_gt=False)
    mesh = make_mesh(data=2, space=2)
    images = parallel_render(
        scene, cams, bg, mesh=mesh, max_instances=MAX_INST, interpret=True
    )
    assert len(images) == 3
    for img, cam in zip(images, cams):
        ref = render(scene, cam, bg, max_instances=MAX_INST, interpret=True, fast=True)
        np.testing.assert_allclose(img, np.asarray(ref.render), atol=1e-5)


def test_parallel_render_edge_inputs():
    """Empty camera lists return empty; mixed resolutions are rejected with a
    clear error (one compiled program per call is the contract)."""
    from lightgaussian_tpu.parallel import parallel_render

    scene, cams, bg = _make_batch(1, with_gt=False)
    assert parallel_render(scene, [], bg, max_instances=MAX_INST, interpret=True) == []

    other = Camera.look_at(
        eye=[0.0, 0.0, -3.5], target=[0, 0, 0], width=W // 2, height=H
    )
    with pytest.raises(ValueError, match="single resolution"):
        parallel_render(
            scene, [cams[0], other], bg, max_instances=MAX_INST, interpret=True
        )


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    img = jax.jit(fn)(*args)
    assert img.shape == (3, 256, 256)
    assert bool(jnp.isfinite(img).all())
    ge.dryrun_multichip(8)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (1, 2)])
def test_gauss_sharded_step_matches_sequential(mesh_shape):
    """The Gaussian-sharded (FSDP-style) step: params/moments sharded over
    `gauss`, splats all_gathered, strips blended per shard — must match the
    same single-chip camera-batch oracle as the (data, space) mode."""
    from lightgaussian_tpu.parallel.gauss import (
        gather_state, make_gauss_mesh, make_gauss_train_step, shard_state,
    )

    data, gauss = mesh_shape
    student = random_scene(n=96, seed=7, capacity=128)
    gt_scene, cams, bg = _make_batch(data)
    batch = stack_cameras(cams)
    opt_cfg = OptimizationParams()

    mesh = make_gauss_mesh(data=data, gauss=gauss)
    step = make_gauss_train_step(
        opt_cfg, 1.0, max_instances=MAX_INST, mesh=mesh, image_height=H,
        interpret=True,
    )
    state = shard_state(init_train_state(student), mesh)
    new_state, metrics = step(state, batch, bg)
    new_state = gather_state(new_state)

    ref_params = _oracle_step(init_train_state(student), cams, bg, opt_cfg)
    got = new_state.scene.params()
    for k in ref_params:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref_params[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"param {k} mismatch for gauss mesh {mesh_shape}",
        )
    assert jnp.isfinite(metrics.loss)
    assert int(np.asarray(new_state.step)) == 1


def test_gauss_sharded_loss_decreases():
    from lightgaussian_tpu.parallel.gauss import (
        make_gauss_mesh, make_gauss_train_step, shard_state,
    )

    data, gauss = 2, 4
    student = random_scene(n=96, seed=11, capacity=128)
    _, cams, bg = _make_batch(data)
    batch = stack_cameras(cams)
    mesh = make_gauss_mesh(data=data, gauss=gauss)
    step = make_gauss_train_step(
        OptimizationParams(), 1.0, max_instances=MAX_INST, mesh=mesh,
        image_height=H, interpret=True,
    )
    state = shard_state(init_train_state(student), mesh)
    first = last = None
    for _ in range(10):
        state, m = step(state, batch, bg)
        if first is None:
            first = float(m.loss)
        last = float(m.loss)
    assert last < first


def test_accumulate_gss_auto_dispatch_matches_sequential():
    """`accumulate_gss_auto` must route to the sharded sweep on a multi-device
    backend and agree with the sequential loop (counts exactly)."""
    from lightgaussian_tpu.train.gss import accumulate_gss, accumulate_gss_auto

    scene, cams, bg = _make_batch(5)
    c_seq, i_seq = accumulate_gss(scene, cams, bg, MAX_INST, interpret=True)
    c_auto, i_auto = accumulate_gss_auto(scene, cams, bg, MAX_INST, interpret=True)
    np.testing.assert_array_equal(np.asarray(c_auto), np.asarray(c_seq))
    np.testing.assert_allclose(np.asarray(i_auto), np.asarray(i_seq), rtol=1e-5, atol=1e-5)
