"""Depth-ordering fidelity of the 32-bit packed (tile | depth) sort key.

The CUDA reference sorts a 64-bit (tileID | f32 depth) key; we pack both
into 32 bits with RANGE-ADAPTIVE depth quantization (`binning.bin_splats`):
the frame-min depth bit-pattern is subtracted and the residual shifted only
as far as the frame's depth range requires. These tests quantify the
approximation on an adversarial depth-fighting scene (VERDICT r1 weak #3):
many overlapping translucent plates with random colors, where any blend-order
flip changes pixels by O(alpha^2 * |color delta|) ~ 0.1.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightgaussian_tpu.models.gaussians import empty_scene
from lightgaussian_tpu.ops.rasterize import render
from lightgaussian_tpu.ops.rasterize import binning
from lightgaussian_tpu.utils.synthetic import default_camera

BG = jnp.array([0.05, 0.05, 0.05], jnp.float32)


def _plate_stack(n_plates=48, dz=1e-5, seed=0, jitter_xy=0.02):
    """n_plates near-coplanar translucent plates at depth ~4, spaced dz apart —
    well below the 2^-12 relative resolution of a naive truncated-f32 key
    (4.0 * 2^-12 ~ 1e-3), so a fixed-shift key would tie ALL of them."""
    rng = np.random.default_rng(seed)
    scene = empty_scene(n_plates, max_sh_degree=0, active_sh_degree=0)
    z = 0.0 + np.arange(n_plates) * dz  # camera at dist 4 looking at origin
    means = np.stack([
        rng.uniform(-jitter_xy, jitter_xy, n_plates),
        rng.uniform(-jitter_xy, jitter_xy, n_plates),
        z,
    ], axis=1).astype(np.float32)
    sh_dc = rng.normal(0.0, 0.8, (n_plates, 3)).astype(np.float32)
    log_scales = np.log(np.full((n_plates, 3), 0.3, np.float32))
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n_plates, 1))
    opa = np.zeros(n_plates, np.float32)  # sigmoid -> alpha 0.5

    fill = lambda buf, v: buf.at[: v.shape[0]].set(jnp.asarray(v))
    return dataclasses.replace(
        scene,
        means=fill(scene.means, means),
        sh_dc=fill(scene.sh_dc, sh_dc),
        log_scales=fill(scene.log_scales, log_scales),
        quats=fill(scene.quats, quats),
        opacity_logits=fill(scene.opacity_logits, opa),
        alive=scene.alive.at[:n_plates].set(True),
    )


@pytest.mark.parametrize("dz", [1e-5, 1e-3])
def test_depth_fight_matches_oracle(dz):
    """Adversarial stack: tiled blend order must match the oracle's exact-f32
    depth order even when plate spacing is far below 2^-12 relative depth.
    With the range-adaptive key the frame's depth range is tiny, the dynamic
    shift is 0, and ordering is exact — pixel deltas drop to f32 summation
    noise. (A fixed-shift 21-bit key ties all plates at dz=1e-5 and blends
    them in index order: measured max pixel delta ~0.3 on this scene.)"""
    scene = _plate_stack(dz=dz, seed=3)
    cam = default_camera(width=96, height=64)
    out_ref = render(scene, cam, BG, method="reference")
    out_tile = render(scene, cam, BG, method="tiled", interpret=True)
    img_r, img_t = np.asarray(out_ref.render), np.asarray(out_tile.render)
    assert img_r.std() > 0.05  # plates actually visible
    max_delta = np.abs(img_t - img_r).max()
    assert max_delta < 5e-5, f"blend-order mismatch: max pixel delta {max_delta}"


def test_depth_fight_reverse_insertion_order():
    """Same stack but Gaussian indices REVERSED w.r.t. depth: a key that ties
    (stable sort = index order) would blend back-to-front and corrupt the
    image badly; exact ordering is index-order independent."""
    scene = _plate_stack(dz=2e-6, seed=5)
    # reverse all per-gaussian arrays so index order opposes depth order
    rev = dict(
        means=scene.means[::-1],
        sh_dc=scene.sh_dc[::-1],
        sh_rest=scene.sh_rest[::-1],
        log_scales=scene.log_scales[::-1],
        quats=scene.quats[::-1],
        opacity_logits=scene.opacity_logits[::-1],
        alive=scene.alive[::-1],
    )
    rscene = dataclasses.replace(scene, **rev)
    cam = default_camera(width=96, height=64)
    a = np.asarray(render(scene, cam, BG, method="tiled", interpret=True).render)
    b = np.asarray(render(rscene, cam, BG, method="tiled", interpret=True).render)
    # identical geometry, identical result regardless of insertion order
    np.testing.assert_allclose(a, b, atol=5e-5)


def test_wide_depth_range_resolution_bound():
    """Scene spanning the full practical frustum (depth ~0.05..80, >10
    octaves): the dynamic shift grows, but resolution must stay <= 2^-16
    relative — plates spaced 2^-15 relative apart must still order exactly."""
    rng = np.random.default_rng(7)
    n_far, n_stack = 64, 32
    n = n_far + n_stack
    scene = empty_scene(n, max_sh_degree=0, active_sh_degree=0)
    # backdrop gaussians spread across a huge depth range (fix the key range)
    far = np.stack([
        rng.uniform(-3, 3, n_far), rng.uniform(-3, 3, n_far),
        np.concatenate([[3.95, -76.0], rng.uniform(-3.0, 70.0, n_far - 2)]),
    ], axis=1).astype(np.float32)  # camera dist 4 -> depths ~0.05 .. 80
    # the contested stack: spacing 2^-15 relative at depth ~4
    dz = 4.0 * 2.0**-15
    stack = np.stack([
        rng.uniform(-0.02, 0.02, n_stack), rng.uniform(-0.02, 0.02, n_stack),
        np.arange(n_stack) * dz,
    ], axis=1).astype(np.float32)
    means = np.concatenate([far, stack]).astype(np.float32)
    sh_dc = rng.normal(0.0, 0.8, (n, 3)).astype(np.float32)
    log_scales = np.log(np.full((n, 3), 0.25, np.float32))
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    opa = np.zeros(n, np.float32)

    fill = lambda buf, v: buf.at[: v.shape[0]].set(jnp.asarray(v))
    scene = dataclasses.replace(
        scene,
        means=fill(scene.means, means), sh_dc=fill(scene.sh_dc, sh_dc),
        log_scales=fill(scene.log_scales, log_scales),
        quats=fill(scene.quats, quats),
        opacity_logits=fill(scene.opacity_logits, opa),
        alive=scene.alive.at[:n].set(True),
    )
    cam = default_camera(width=96, height=64)
    out_ref = render(scene, cam, BG, method="reference")
    out_tile = render(scene, cam, BG, method="tiled", interpret=True)
    max_delta = np.abs(np.asarray(out_tile.render) - np.asarray(out_ref.render)).max()
    assert max_delta < 5e-5, f"wide-range resolution too coarse: delta {max_delta}"


def test_adaptive_key_orders_sub_resolution_depths():
    """Unit-level: the packed keys themselves must be strictly increasing for
    depths spaced below the naive key's resolution."""
    depths = (4.0 + np.arange(32, dtype=np.float64) * 1e-5).astype(np.float32)
    grid = binning.make_grid(1920, 1080, 16)
    depth_bits = binning.sort_key_bits(grid)
    raw = depths.view(np.uint32)
    # naive fixed-shift key ties everything...
    naive = raw >> (32 - depth_bits)
    assert len(np.unique(naive)) < 4
    # ...the adaptive scheme separates every distinct f32 depth
    base = raw.min()
    rel = raw - base
    bits_needed = int(rel.max()).bit_length()
    shift = max(bits_needed - depth_bits, 0)
    adaptive = rel >> shift
    assert shift == 0
    assert (np.diff(adaptive.astype(np.int64)) > 0).all()
