"""Parity gates: tiled Pallas rasterizer (interpret mode) vs the jnp oracle —
forward image, parameter gradients, and counting outputs (BASELINE config[0])."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightgaussian_tpu.models.gaussians import GaussianScene
from lightgaussian_tpu.ops.rasterize import render, count_render
from lightgaussian_tpu.utils.synthetic import default_camera, random_scene

BG = jnp.array([0.1, 0.2, 0.3], jnp.float32)


@pytest.fixture(scope="module")
def scene():
    return random_scene(n=256, seed=1)


@pytest.fixture(scope="module")
def camera():
    return default_camera(width=96, height=64)


class TestForwardParity:
    def test_image_matches_oracle(self, scene, camera):
        out_ref = render(scene, camera, BG, method="reference")
        out_tile = render(scene, camera, BG, method="tiled", interpret=True)
        np.testing.assert_allclose(
            np.asarray(out_tile.render), np.asarray(out_ref.render), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_tile.final_T), np.asarray(out_ref.final_T), atol=2e-5
        )

    def test_image_nontrivial(self, scene, camera):
        out = render(scene, camera, BG, method="reference")
        img = np.asarray(out.render)
        assert img.std() > 0.05  # scene actually renders something
        assert np.asarray(out.final_T).min() < 0.6  # some opacity accumulated
        assert int(np.asarray(out.visibility).sum()) > 100

    def test_empty_scene_renders_bg(self, camera):
        import dataclasses

        s = random_scene(n=8, seed=2)
        s = dataclasses.replace(s, alive=jnp.zeros_like(s.alive))
        out = render(s, camera, BG, method="tiled", interpret=True)
        img = np.asarray(out.render)
        np.testing.assert_allclose(img, np.broadcast_to(np.asarray(BG)[:, None, None], img.shape), atol=1e-6)


class TestGradientParity:
    def _loss_fn(self, method, camera, weights, interpret=False):
        def loss(params, scene: GaussianScene, bg):
            s = scene.with_params(params)
            out = render(s, camera, bg, method=method, interpret=interpret)
            return (out.render * weights).sum()

        return loss

    def test_grads_match_oracle(self, scene, camera, rng):
        weights = jnp.asarray(rng.normal(size=(3, camera.height, camera.width)), jnp.float32)
        params = scene.params()
        g_ref = jax.grad(self._loss_fn("reference", camera, weights))(params, scene, BG)
        g_tile = jax.grad(self._loss_fn("tiled", camera, weights, interpret=True))(
            params, scene, BG
        )
        for k in params:
            a, b = np.asarray(g_tile[k]), np.asarray(g_ref[k])
            scale = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(
                a / scale, b / scale, atol=5e-5, err_msg=f"grad mismatch for {k}"
            )
            assert np.abs(b).max() > 0, f"oracle grad for {k} is all-zero (vacuous test)"

    def test_bg_gradient(self, scene, camera):
        def loss(bg):
            return render(scene, camera, bg, method="tiled", interpret=True).render.sum()

        g = jax.grad(loss)(BG)
        out = render(scene, camera, BG, method="reference")
        expected = np.asarray(out.final_T).sum()
        np.testing.assert_allclose(np.asarray(g), np.full(3, expected), rtol=1e-4)

    def test_mean2d_offset_gradient(self, scene, camera, rng):
        """The densification-stats hook: grads w.r.t. the NDC offset dummy."""
        weights = jnp.asarray(rng.normal(size=(3, camera.height, camera.width)), jnp.float32)

        def loss(offset, method, interpret=False):
            out = render(
                scene, camera, BG, mean2d_offset=offset, method=method, interpret=interpret
            )
            return (out.render * weights).sum()

        zeros = jnp.zeros((scene.capacity, 2), jnp.float32)
        g_ref = jax.grad(lambda o: loss(o, "reference"))(zeros)
        g_tile = jax.grad(lambda o: loss(o, "tiled", True))(zeros)
        scale = np.abs(np.asarray(g_ref)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(g_tile) / scale, np.asarray(g_ref) / scale, atol=5e-5
        )
        assert scale > 1e-3


class TestCounting:
    def test_counts_match_oracle(self, scene, camera):
        out_ref = count_render(scene, camera, BG, method="reference")
        out_tile = count_render(scene, camera, BG, method="tiled", interpret=True)
        np.testing.assert_allclose(
            np.asarray(out_tile.important_score),
            np.asarray(out_ref.important_score),
            atol=1e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(out_tile.gaussians_count), np.asarray(out_ref.gaussians_count)
        )
        # image from counting kernel matches plain forward
        plain = render(scene, camera, BG, method="tiled", interpret=True)
        np.testing.assert_allclose(
            np.asarray(out_tile.render), np.asarray(plain.render), atol=1e-6
        )

    def test_counts_nontrivial(self, scene, camera):
        out = count_render(scene, camera, BG, method="reference")
        assert int(np.asarray(out.gaussians_count).sum()) > 1000
        assert float(np.asarray(out.important_score).sum()) > 1.0


class TestExactTileBinning:
    """The exact ellipse-vs-tile intersection cull (`binning._exact_tile_mask`)
    must be output-neutral: dropped (Gaussian, tile) instances have no pixel
    with alpha >= ALPHA_EPS, so they blend exactly zero. Only f32 summation
    regrouping at 128-instance chunk boundaries may differ."""

    def test_kth_set_bit_matches_numpy(self):
        from lightgaussian_tpu.ops.rasterize.binning import _kth_set_bit

        rng = np.random.default_rng(0)
        masks = rng.integers(1, 2**32, size=512, dtype=np.uint64).astype(np.uint32)
        masks[:4] = [1, 2**31, 0xFFFFFFFF, 0x80000001]
        for l in (0, 1, 5):
            got = np.asarray(
                _kth_set_bit(jnp.asarray(masks), jnp.full(masks.shape, l, jnp.int32))
            )
            for i, m in enumerate(masks):
                bits = [b for b in range(32) if (int(m) >> b) & 1]
                if l < len(bits):
                    assert got[i] == bits[l], (hex(int(m)), l, got[i])

    def test_exact_cull_is_output_neutral(self, scene, camera):
        import lightgaussian_tpu.ops.rasterize.binning as bm
        from lightgaussian_tpu.ops.rasterize import tiled

        def run():
            tiled._get_blend_fn.cache_clear()
            out = render(scene, camera, BG, method="tiled", interpret=True)

            def loss(params):
                s = scene.with_params(params)
                o = render(s, camera, BG, method="tiled", interpret=True)
                return (o.render * o.render).sum()

            g = jax.grad(loss)(scene.params())
            return out, g

        out_exact, g_exact = run()
        orig = bm._exact_tile_mask

        def rect_only(splats, lo_x, lo_y, hi_x, rect_count, tile_size):
            mask, c, um = orig(splats, lo_x, lo_y, hi_x, rect_count, tile_size)
            return jnp.zeros_like(mask), rect_count, jnp.zeros_like(um)

        bm._exact_tile_mask = rect_only
        try:
            out_rect, g_rect = run()
        finally:
            bm._exact_tile_mask = orig
            tiled._get_blend_fn.cache_clear()

        assert int(out_exact.num_instances) <= int(out_rect.num_instances)
        np.testing.assert_allclose(
            np.asarray(out_exact.render), np.asarray(out_rect.render), atol=1e-6
        )
        for a, b in zip(jax.tree.leaves(g_exact), jax.tree.leaves(g_rect)):
            scale = np.abs(np.asarray(b)).max() + 1e-8
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-5
            )


class TestSegmentReduceGarbageTail:
    """The round-3 sentinel-free gradient reduce relies on two properties of
    `segment_reduce_pre`: (1) rows at positions past the last segment boundary
    never influence any output — even when they are NaN/Inf (unwritten kernel
    HBM is arbitrary garbage, NaN in interpret mode); (2) the block prefix is
    built by SHIFT, not `cumsum - block_tot`, which would compute NaN - NaN
    for the very block whose tail holds the garbage (the round-3 regression
    caught by test_grads_match_oracle)."""

    @pytest.mark.parametrize("reduce_name", ["segment_reduce_pre", "segment_reduce_pre_folded"])
    def test_nan_tail_is_inert(self, rng, reduce_name):
        import jax.numpy as jnp
        from lightgaussian_tpu.ops.rasterize import binning

        reduce_fn = getattr(binning, reduce_name)
        n, total, cap, f = 37, 1500, 4096, 16
        vals = rng.normal(size=(cap, f)).astype(np.float32)
        vals[total:] = np.nan  # garbage tail INSIDE the boundary block too
        # segment boundaries: n segments covering exactly [0, total)
        cuts = np.sort(rng.choice(np.arange(1, total), n - 1, replace=False))
        cum = np.concatenate([cuts, [total]]).astype(np.int32)
        got = np.asarray(
            reduce_fn(jnp.asarray(vals), jnp.asarray(cum), block=512)
        )
        assert np.isfinite(got).all(), "garbage tail leaked into segment sums"
        lo = np.concatenate([[0], cum[:-1]])
        want = np.stack([vals[a:b].sum(axis=0) for a, b in zip(lo, cum)])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    @pytest.mark.parametrize("f", [2, 16])
    def test_folded_matches_unfolded(self, rng, f):
        import jax.numpy as jnp
        from lightgaussian_tpu.ops.rasterize.binning import (
            segment_reduce_pre,
            segment_reduce_pre_folded,
        )

        cap, total, n = 8192, 7420, 301
        vals = rng.normal(size=(cap, f)).astype(np.float32)
        cuts = np.sort(rng.choice(np.arange(1, total), n - 1, replace=False))
        cum = jnp.asarray(np.concatenate([cuts, [total]]), jnp.int32)
        a = np.asarray(segment_reduce_pre(jnp.asarray(vals), cum))
        b = np.asarray(segment_reduce_pre_folded(jnp.asarray(vals), cum))
        # same sums, re-associated: f32 rounding only
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def test_zero_count_segments(self, rng):
        import jax.numpy as jnp
        from lightgaussian_tpu.ops.rasterize.binning import segment_reduce_pre

        vals = rng.normal(size=(256, 4)).astype(np.float32)
        vals[100:] = np.inf
        cum = jnp.asarray([40, 40, 100, 100], jnp.int32)  # two empty segments
        got = np.asarray(segment_reduce_pre(jnp.asarray(vals), cum, block=64))
        np.testing.assert_allclose(got[1], 0.0)
        np.testing.assert_allclose(got[3], 0.0)
        np.testing.assert_allclose(got[0], vals[:40].sum(axis=0), rtol=1e-5)
        np.testing.assert_allclose(got[2], vals[40:100].sum(axis=0), rtol=1e-5)


def test_unchunk_transpose_matches_xla(rng):
    """Pallas A/B candidate must be bit-identical to the XLA unchunk form."""
    import jax.numpy as jnp
    from lightgaussian_tpu.ops.rasterize import pallas_blend as pk
    from lightgaussian_tpu.ops.rasterize.tiled import _unchunk

    x = jnp.asarray(rng.normal(size=(48, 16, 128)).astype(np.float32))
    for k in (8, 16):
        got = np.asarray(pk.unchunk_transpose(x, chunks_per_block=k, interpret=True))
        np.testing.assert_array_equal(got, np.asarray(_unchunk(x)))


def test_fast_render_matches_exact_within_teps():
    """The render-only fast kernel (no applied-T reduction) must match the
    exact forward on image and final_T up to the saturated-pixel bound
    (T_EPS / (1 - MAX_ALPHA) = 1e-2 worst case; measured ~4e-4), on a scene
    dense enough to trigger transmittance saturation + early exit."""
    from lightgaussian_tpu.ops.rasterize import render
    from lightgaussian_tpu.utils.synthetic import default_camera, random_scene

    scene = random_scene(n=2048, seed=1, extent=1.2, scale_range=(0.01, 0.06))
    camera = default_camera(width=192, height=128)
    bg = jnp.array([0.3, 0.5, 0.7], jnp.float32)
    exact = render(scene, camera, bg, max_instances=1 << 15, interpret=True)
    fast = render(scene, camera, bg, max_instances=1 << 15, interpret=True, fast=True)
    d_img = float(jnp.abs(fast.render - exact.render).max())
    d_t = float(jnp.abs(fast.final_T - exact.final_T).max())
    assert d_img <= 2e-3, d_img
    assert d_t <= 2e-3, d_t
    # and the cached-path fast variant agrees with itself bit-wise
    from lightgaussian_tpu.ops.rasterize import build_binning as api_bin

    b = api_bin(scene, camera, max_instances=1 << 15)
    cached = render(scene, camera, bg, cached_binning=b, interpret=True, fast=True)
    np.testing.assert_array_equal(np.asarray(cached.render), np.asarray(fast.render))
