"""Differentiable tiled blend: binning + Pallas kernels under a custom VJP.

The VJP boundary sits *after* the (autodiff-friendly) jnp preprocess: inputs are
screen-space splats. Forward runs binning + the Pallas blend; backward reuses
the forward's binning (saved integer residuals), runs the Pallas backward to
per-instance gradients, and segment-sums them to per-Gaussian gradients —
the atomics-free TPU replacement for CUDA's atomicAdd accumulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lightgaussian_tpu.ops.rasterize import binning as binning_mod
from lightgaussian_tpu.ops.rasterize import pallas_blend as pk
from lightgaussian_tpu.ops.rasterize.binning import TILE_SIZE, make_grid
from lightgaussian_tpu.ops.rasterize.projection import Splats


def _assemble_image(tile_planes: jnp.ndarray, grid) -> jnp.ndarray:
    """[T, C, PIX] per-tile planes -> [C, H_pad, W_pad] image."""
    c = tile_planes.shape[1]
    x = tile_planes.reshape(grid.tiles_y, grid.tiles_x, c, TILE_SIZE, TILE_SIZE)
    x = x.transpose(2, 0, 3, 1, 4)
    return x.reshape(c, grid.tiles_y * TILE_SIZE, grid.tiles_x * TILE_SIZE)


def _tile_image(image_pad: jnp.ndarray, grid) -> jnp.ndarray:
    """[C, H_pad, W_pad] -> [T, C, PIX] per-tile planes."""
    c = image_pad.shape[0]
    x = image_pad.reshape(c, grid.tiles_y, TILE_SIZE, grid.tiles_x, TILE_SIZE)
    x = x.transpose(1, 3, 0, 2, 4)
    return x.reshape(grid.num_tiles, c, TILE_SIZE * TILE_SIZE)


def _unchunk(chunked: jnp.ndarray) -> jnp.ndarray:
    """[NC, F, 128] chunk-major -> [NC*128, F] instance-major."""
    nc, f, g = chunked.shape
    return chunked.transpose(0, 2, 1).reshape(nc * g, f)


@functools.lru_cache(maxsize=32)
def _get_blend_fn(width: int, height: int, max_instances: int, interpret: bool):
    grid = make_grid(width, height)

    def _forward(splats: Splats, bg: jnp.ndarray):
        b = binning_mod.bin_splats(splats, grid, max_instances)
        tile_rgb, tile_t = pk.blend_forward(b.tile_starts, b.inst_chunks, grid, interpret)
        img_pad = _assemble_image(tile_rgb, grid)
        t_pad = _assemble_image(tile_t, grid)[0]
        image = img_pad[:, :height, :width] + t_pad[None, :height, :width] * bg[:, None, None]
        return image, t_pad[:height, :width], b

    @jax.custom_vjp
    def blend(splats: Splats, bg: jnp.ndarray):
        image, final_t, b = _forward(splats, bg)
        return image, final_t, b.total

    def blend_fwd(splats: Splats, bg: jnp.ndarray):
        image, final_t, b = _forward(splats, bg)
        return (image, final_t, b.total), (splats, bg, image, final_t, b)

    def blend_bwd(res, cotangents):
        splats, bg, image, final_t, b = res
        g_image, g_t, _g_total = cotangents
        n = splats.mean2d.shape[0]

        # Per-pixel "remaining contribution" seed: dot(C_rendered, g) plus the
        # direct cotangent of the T output (both decay as -x/(1-alpha_i)).
        r = (image * g_image).sum(axis=0) + final_t * g_t  # [H, W]
        g_pad = jnp.zeros((3, grid.tiles_y * TILE_SIZE, grid.tiles_x * TILE_SIZE))
        g_pad = g_pad.at[:, :height, :width].set(g_image)
        r_pad = jnp.zeros((1, grid.tiles_y * TILE_SIZE, grid.tiles_x * TILE_SIZE))
        r_pad = r_pad.at[0, :height, :width].set(r)

        tile_g = _tile_image(g_pad, grid)
        tile_r = _tile_image(r_pad, grid)
        grad_chunks = pk.blend_backward(
            b.tile_starts, b.inst_chunks, tile_g, tile_r, grid, interpret
        )
        inst_grads = _unchunk(grad_chunks)  # [CAP, FEAT_WIDTH]

        # Reduce per-instance grads to per-Gaussian grads: gather them into
        # pre-sort slot order (contiguous per Gaussian), then a two-level
        # cumsum + boundary diff. Row-GATHER costs ~8 ns/row independent of
        # width; the tempting row-scatter inverse costs ~6 ns/ELEMENT (16x
        # worse here, measured 102 -> 203 ms/step), and XLA's scatter-add
        # segment sum is worse still.
        #
        # The concatenate looks removable (dead slots gather garbage rows
        # whose cumsum positions sit past every segment boundary — harmless,
        # see segment_reduce_pre) but it is LOAD-BEARING FOR LAYOUT, not
        # semantics: without it XLA feeds the gather the transpose's output
        # in its transpose-native (column-major-ish) layout, so every
        # gathered "row" touches 16 strided cache lines, and the fused
        # gather runs ~2x slower END TO END (measured r3, profile_bwd:
        # 19.4 ms with the copy vs 37.4 ms without, optimization_barrier
        # does not help). The copy forces a row-contiguous operand.
        inst_grads = jnp.concatenate(
            [inst_grads, jnp.zeros((1, inst_grads.shape[1]), inst_grads.dtype)]
        )
        # pre_pos is a permutation of [0, CAP) by construction (second sort
        # in bin_splats), so the bounds check and duplicate handling can be
        # skipped in the gather lowering.
        pre_grads = inst_grads.at[b.pre_pos].get(
            unique_indices=True, mode="promise_in_bounds"
        )
        per_gauss = binning_mod.segment_reduce_pre(pre_grads, b.gauss_cum)

        d_splats = Splats(
            mean2d=per_gauss[:, binning_mod.FEAT_MX:binning_mod.FEAT_MY + 1],
            conic=per_gauss[:, binning_mod.FEAT_CA:binning_mod.FEAT_CC + 1],
            color=per_gauss[:, binning_mod.FEAT_R:binning_mod.FEAT_B + 1],
            opacity=per_gauss[:, binning_mod.FEAT_OPA],
            depth=jnp.zeros_like(splats.depth),
            radius=np.zeros(splats.radius.shape, jax.dtypes.float0),
        )
        d_bg = (final_t[None] * g_image).sum(axis=(1, 2))
        return d_splats, d_bg

    blend.defvjp(blend_fwd, blend_bwd)
    return blend


def blend_tiled(
    splats: Splats,
    bg: jnp.ndarray,
    width: int,
    height: int,
    max_instances: int,
    interpret: bool = False,
):
    """Differentiable blend. Returns (image [3,H,W], final_T [H,W], total int32).

    `total` is the live instance count (monitor vs `max_instances` for overflow).
    """
    return _get_blend_fn(width, height, max_instances, bool(interpret))(splats, bg)


def blend_tiled_cached(
    splats: Splats,
    bg: jnp.ndarray,
    width: int,
    height: int,
    cached: "binning_mod.Binning",
    interpret: bool = False,
    fast: bool = False,
):
    """Forward-only blend reusing a cached Binning's (tile | depth) order:
    features are re-gathered from the NEW splats (one row-gather), the sorts /
    rects / searchsorted are skipped. For trajectory rendering where the
    camera moves a little per frame; image deltas vs fresh binning are
    quantified in tests/test_temporal_binning.py and PERF.md. NOT
    differentiable (no VJP residuals for the new splats). `fast` uses the
    render-only kernel (naive-T background weight; measured image delta
    ~4e-4, worst case 1e-2 on saturated pixels — see _fast_kernel)."""
    grid = make_grid(width, height)
    b = binning_mod.rebind_features(splats, cached)
    fwd = pk.blend_forward_fast if fast else pk.blend_forward
    tile_rgb, tile_t = fwd(b.tile_starts, b.inst_chunks, grid, interpret)
    img_pad = _assemble_image(tile_rgb, grid)
    t_pad = _assemble_image(tile_t, grid)[0]
    image = img_pad[:, :height, :width] + t_pad[None, :height, :width] * bg[:, None, None]
    return image, t_pad[:height, :width], b.total


def blend_tiled_fast(
    splats: Splats,
    bg: jnp.ndarray,
    width: int,
    height: int,
    max_instances: int,
    interpret: bool = False,
):
    """Render-only fresh-binning blend: the inference fast path. Runs the
    `_fast_kernel` (no applied-T reduction; measured image delta ~4e-4,
    worst case 1e-2 on saturated pixels, vs the exact forward) over a
    forward-only Binning (no `slots` sort payload, no pre_pos second sort —
    the backward-only products XLA alone cannot strip out of the variadic
    sort op)."""
    grid = make_grid(width, height)
    b = binning_mod.bin_splats(splats, grid, max_instances, forward_only=True)
    tile_rgb, tile_t = pk.blend_forward_fast(b.tile_starts, b.inst_chunks, grid, interpret)
    img_pad = _assemble_image(tile_rgb, grid)
    t_pad = _assemble_image(tile_t, grid)[0]
    image = img_pad[:, :height, :width] + t_pad[None, :height, :width] * bg[:, None, None]
    return image, t_pad[:height, :width], b.total


def build_binning(
    splats: Splats,
    width: int,
    height: int,
    max_instances: int,
) -> "binning_mod.Binning":
    """Bin splats for later reuse by `blend_tiled_cached` (forward-only: the
    cached-reuse path re-gathers features and never touches pre_pos)."""
    return binning_mod.bin_splats(
        splats, make_grid(width, height), max_instances, forward_only=True
    )


def blend_tiled_counting(
    splats: Splats,
    bg: jnp.ndarray,
    width: int,
    height: int,
    max_instances: int,
    interpret: bool = False,
):
    """Non-differentiable counting forward: also returns per-Gaussian
    (hit_count int32, imp_score float32) — the reference's f_count outputs."""
    grid = make_grid(width, height)
    n = splats.mean2d.shape[0]
    b = binning_mod.bin_splats(splats, grid, max_instances)
    tile_rgb, tile_t, imp, cnt = pk.blend_forward_counting(
        b.tile_starts, b.inst_chunks, grid, interpret
    )
    img_pad = _assemble_image(tile_rgb, grid)
    t_pad = _assemble_image(tile_t, grid)[0]
    image = img_pad[:, :height, :width] + t_pad[None, :height, :width] * bg[:, None, None]

    stats = jnp.stack([_unchunk(imp)[:, 0], _unchunk(cnt)[:, 0]], axis=1)  # [CAP, 2]
    # The concat is a layout-forcing copy for the row-gather (see blend_bwd
    # above); dead slots hitting the appended zero row is incidental.
    stats = jnp.concatenate([stats, jnp.zeros((1, 2), stats.dtype)])
    pre_stats = stats[b.pre_pos]
    per_gauss = binning_mod.segment_reduce_pre(pre_stats, b.gauss_cum)
    gauss_imp = per_gauss[:, 0]
    gauss_cnt = per_gauss[:, 1].astype(jnp.int32)
    return image, t_pad[:height, :width], b.total, gauss_cnt, gauss_imp
