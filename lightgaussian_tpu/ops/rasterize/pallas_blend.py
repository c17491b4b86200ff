"""Pallas TPU kernels for per-tile front-to-back alpha blending (fwd + bwd).

TPU-native re-design of the CUDA rasterizer's renderCUDA / renderBackwardCUDA
(SURVEY.md §2.1a): one grid program per 32x32-pixel tile; each program streams
its (tile, depth)-sorted instance range from HBM in double-buffered chunks and
blends all 1024 pixels at once:

- within-chunk transmittance prefixes are a strict-lower-triangular matmul of
  log(1-alpha) on the MXU (no sequential per-splat loop),
- color accumulation is a [3,G]x[G,1024] matmul,
- the reference's sequential early-stop (T*(1-a) < 1e-4 freezes T) is the
  equivalent monotone masked form proved in reference.py,
- the backward re-walks chunks *front-to-back* carrying the per-pixel
  "remaining contribution" scalar, so no reverse storage is needed, and
  per-instance gradients go to an HBM buffer (segment-summed to Gaussians
  outside the kernel — no atomics).

Counting (`f_count`) emits per-instance hit counts and alpha*T mass in the same
forward walk (`/root/reference/gaussian_renderer/__init__.py:156-229` semantics).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lightgaussian_tpu.ops.rasterize.binning import (
    FEAT_CA,
    FEAT_CB,
    FEAT_CC,
    FEAT_MX,
    FEAT_MY,
    FEAT_OPA,
    FEAT_R,
    FEAT_B,
    FEAT_WIDTH,
    TILE_SIZE,
    TileGrid,
)
from lightgaussian_tpu.ops.rasterize.projection import ALPHA_EPS, MAX_ALPHA, T_EPS

BLEND_CHUNK = 64  # instances blended per inner step
PIX = TILE_SIZE * TILE_SIZE  # 1024 pixels/tile = 8 sublanes x 128 lanes of f32


def _pixel_coords(tile_id, tiles_x):
    """Per-tile pixel coordinate rows: px, py of shape [1, PIX] (float32)."""
    tx = tile_id % tiles_x
    ty = tile_id // tiles_x
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    px = (tx * TILE_SIZE + lane % TILE_SIZE).astype(jnp.float32)
    py = (ty * TILE_SIZE + lane // TILE_SIZE).astype(jnp.float32)
    return px, py


def _chunk_alpha(f, px, py, k, count, pix_valid):
    """Shared fwd/bwd per-chunk alpha computation.

    f: [G, FEAT_WIDTH] packed features. Returns (alpha [G,PIX], extras dict).
    """
    mx = f[:, FEAT_MX:FEAT_MX + 1]
    my = f[:, FEAT_MY:FEAT_MY + 1]
    ca = f[:, FEAT_CA:FEAT_CA + 1]
    cb = f[:, FEAT_CB:FEAT_CB + 1]
    cc = f[:, FEAT_CC:FEAT_CC + 1]
    opa = f[:, FEAT_OPA:FEAT_OPA + 1]
    dx = px - mx  # [G, PIX]
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g_exp = jnp.exp(power)
    alpha_raw = opa * g_exp
    alpha = jnp.minimum(MAX_ALPHA, alpha_raw)
    row = jax.lax.broadcasted_iota(jnp.int32, (BLEND_CHUNK, 1), 0)
    in_range = (k * BLEND_CHUNK + row) < count
    elig = (power <= 0.0) & (alpha >= ALPHA_EPS) & in_range & pix_valid
    alpha = jnp.where(elig, alpha, 0.0)
    return alpha, dict(
        dx=dx, dy=dy, g_exp=g_exp, alpha_raw=alpha_raw, elig=elig,
        ca=ca, cb=cb, cc=cc, opa=opa,
    )


def _tri_masks():
    ri = jax.lax.broadcasted_iota(jnp.int32, (BLEND_CHUNK, BLEND_CHUNK), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (BLEND_CHUNK, BLEND_CHUNK), 1)
    strict_lower = (ci < ri).astype(jnp.float32)  # exclusive prefix
    incl_lower = (ci <= ri).astype(jnp.float32)  # inclusive prefix
    return strict_lower, incl_lower


def _fwd_kernel(
    starts_ref,  # scalar prefetch: [T+1] int32
    inst_hbm,  # [M_pad, FEAT_WIDTH] f32 (ANY)
    rgb_out,  # [1, 3, PIX] VMEM block
    t_out,  # [1, 1, PIX] VMEM block
    buf,  # VMEM scratch (2, G, FEAT_WIDTH)
    sems,  # DMA sems (2,)
    *,
    tiles_x: int,
    width: int,
    height: int,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = starts_ref[t + 1] - start
    nchunks = pl.cdiv(count, BLEND_CHUNK)

    px, py = _pixel_coords(t, tiles_x)
    pix_valid = (px < width) & (py < height)
    strict_lower, _ = _tri_masks()

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            inst_hbm.at[pl.ds(start + k * BLEND_CHUNK, BLEND_CHUNK)],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(state):
        k, t_naive, t_act, rgb = state
        slot = k % 2

        @pl.when(k + 1 < nchunks)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        get_dma(slot, k).wait()
        f = buf[slot]
        alpha, _ = _chunk_alpha(f, px, py, k, count, pix_valid)
        lg = jnp.log1p(-alpha)
        ecs = jnp.dot(strict_lower, lg, preferred_element_type=jnp.float32)
        t_i = t_naive * jnp.exp(ecs)  # [G, PIX]
        apply = (t_i * (1.0 - alpha)) >= T_EPS
        w = jnp.where(apply, alpha * t_i, 0.0)
        col = f[:, FEAT_R:FEAT_B + 1]  # [G, 3]
        rgb = rgb + jax.lax.dot_general(
            col, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        t_naive = t_naive * jnp.exp(jnp.sum(lg, axis=0, keepdims=True))
        t_act = t_act * jnp.exp(
            jnp.sum(jnp.where(apply, lg, 0.0), axis=0, keepdims=True)
        )
        return k + 1, t_naive, t_act, rgb

    def cond(state):
        k, t_naive, _, _ = state
        return (k < nchunks) & (jnp.max(t_naive) >= T_EPS)

    init = (
        jnp.int32(0),
        jnp.ones((1, PIX), jnp.float32),
        jnp.ones((1, PIX), jnp.float32),
        jnp.zeros((3, PIX), jnp.float32),
    )
    k_end, _, t_act, rgb = jax.lax.while_loop(cond, body, init)

    # Early exit leaves one started-but-unawaited DMA in flight; drain it.
    @pl.when(k_end < nchunks)
    def _():
        get_dma(k_end % 2, k_end).wait()

    rgb_out[0] = rgb
    t_out[0] = t_act


def _count_kernel(
    starts_ref,
    inst_hbm,
    rgb_out,
    t_out,
    imp_out,  # [M_pad, 1] f32 (ANY) — per-instance alpha*T mass
    cnt_out,  # [M_pad, 1] f32 (ANY) — per-instance pixel hit count
    buf,
    sems,
    stat_buf,  # VMEM scratch (G, 2)
    stat_sem,
    *,
    tiles_x: int,
    width: int,
    height: int,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = starts_ref[t + 1] - start
    nchunks = pl.cdiv(count, BLEND_CHUNK)

    px, py = _pixel_coords(t, tiles_x)
    pix_valid = (px < width) & (py < height)
    strict_lower, _ = _tri_masks()

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            inst_hbm.at[pl.ds(start + k * BLEND_CHUNK, BLEND_CHUNK)],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(k, state):
        t_naive, t_act, rgb = state
        slot = k % 2

        @pl.when(k + 1 < nchunks)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        get_dma(slot, k).wait()
        f = buf[slot]
        alpha, _ = _chunk_alpha(f, px, py, k, count, pix_valid)
        lg = jnp.log1p(-alpha)
        ecs = jnp.dot(strict_lower, lg, preferred_element_type=jnp.float32)
        t_i = t_naive * jnp.exp(ecs)
        apply = (t_i * (1.0 - alpha)) >= T_EPS
        w = jnp.where(apply, alpha * t_i, 0.0)
        col = f[:, FEAT_R:FEAT_B + 1]
        rgb = rgb + jax.lax.dot_general(
            col, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

        # Per-instance stats -> HBM (sequential grid, no races).
        stat_sem_copy = pltpu.make_async_copy(
            stat_buf.at[:, 0:1],
            imp_out.at[pl.ds(start + k * BLEND_CHUNK, BLEND_CHUNK)],
            stat_sem,
        )
        stat_buf[:, 0:1] = jnp.sum(w, axis=1, keepdims=True)
        stat_buf[:, 1:2] = jnp.sum((w > 0.0).astype(jnp.float32), axis=1, keepdims=True)
        stat_sem_copy.start()
        stat_sem_copy.wait()
        cnt_copy = pltpu.make_async_copy(
            stat_buf.at[:, 1:2],
            cnt_out.at[pl.ds(start + k * BLEND_CHUNK, BLEND_CHUNK)],
            stat_sem,
        )
        cnt_copy.start()
        cnt_copy.wait()

        t_naive = t_naive * jnp.exp(jnp.sum(lg, axis=0, keepdims=True))
        t_act = t_act * jnp.exp(
            jnp.sum(jnp.where(apply, lg, 0.0), axis=0, keepdims=True)
        )
        return t_naive, t_act, rgb

    init = (
        jnp.ones((1, PIX), jnp.float32),
        jnp.ones((1, PIX), jnp.float32),
        jnp.zeros((3, PIX), jnp.float32),
    )
    # No early exit: every instance slot must be written.
    _, t_act, rgb = jax.lax.fori_loop(0, nchunks, body, init)
    rgb_out[0] = rgb
    t_out[0] = t_act


def _bwd_kernel(
    starts_ref,
    inst_hbm,
    g_rgb_ref,  # [1, 3, PIX] block: dL/d(pre-crop tile rgb)
    r_init_ref,  # [1, 1, PIX] block: per-pixel dot(C_rendered, g) incl. bg
    grads_out,  # [M_pad, FEAT_WIDTH] f32 (ANY): per-instance feature grads
    buf,
    sems,
    grad_buf,  # VMEM scratch (G, FEAT_WIDTH)
    grad_sem,
    *,
    tiles_x: int,
    width: int,
    height: int,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    count = starts_ref[t + 1] - start
    nchunks = pl.cdiv(count, BLEND_CHUNK)

    px, py = _pixel_coords(t, tiles_x)
    pix_valid = (px < width) & (py < height)
    strict_lower, incl_lower = _tri_masks()
    g = g_rgb_ref[0]  # [3, PIX]

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            inst_hbm.at[pl.ds(start + k * BLEND_CHUNK, BLEND_CHUNK)],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(k, state):
        t_naive, r_carry = state  # [1,PIX], [1,PIX]
        slot = k % 2

        @pl.when(k + 1 < nchunks)
        def _():
            get_dma((k + 1) % 2, k + 1).start()

        get_dma(slot, k).wait()
        f = buf[slot]
        alpha, ex = _chunk_alpha(f, px, py, k, count, pix_valid)
        lg = jnp.log1p(-alpha)
        ecs = jnp.dot(strict_lower, lg, preferred_element_type=jnp.float32)
        t_i = t_naive * jnp.exp(ecs)
        apply = (t_i * (1.0 - alpha)) >= T_EPS
        w = jnp.where(apply, alpha * t_i, 0.0)

        col = f[:, FEAT_R:FEAT_B + 1]  # [G, 3]
        cw = jnp.dot(col, g, preferred_element_type=jnp.float32)  # [G, PIX]
        contrib = cw * w
        incl_prefix = jnp.dot(incl_lower, contrib, preferred_element_type=jnp.float32)
        r_i = r_carry - incl_prefix  # remaining contribution after i (incl. bg)
        d_alpha = jnp.where(apply, cw * t_i - r_i / (1.0 - alpha), 0.0)

        # Chain through alpha = min(0.99, opa * exp(power)); the clamp and the
        # eligibility gates are non-differentiable cutoffs (as in CUDA).
        unclamped = ex["alpha_raw"] < MAX_ALPHA
        d_alpha_raw = jnp.where(unclamped & ex["elig"], d_alpha, 0.0)
        d_opa = d_alpha_raw * ex["g_exp"]  # [G, PIX]
        d_power = d_alpha_raw * ex["alpha_raw"]
        dx, dy = ex["dx"], ex["dy"]
        d_ca = -0.5 * d_power * dx * dx
        d_cb = -d_power * dx * dy
        d_cc = -0.5 * d_power * dy * dy
        # d(power)/d(dx) = -(ca*dx + cb*dy); dx = px - mx => d/d(mx) = +...
        d_mx = d_power * (ex["ca"] * dx + ex["cb"] * dy)
        d_my = d_power * (ex["cc"] * dy + ex["cb"] * dx)

        d_col = jax.lax.dot_general(
            w, g, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [G, 3]

        grad_buf[:, FEAT_MX:FEAT_MX + 1] = jnp.sum(d_mx, axis=1, keepdims=True)
        grad_buf[:, FEAT_MY:FEAT_MY + 1] = jnp.sum(d_my, axis=1, keepdims=True)
        grad_buf[:, FEAT_CA:FEAT_CA + 1] = jnp.sum(d_ca, axis=1, keepdims=True)
        grad_buf[:, FEAT_CB:FEAT_CB + 1] = jnp.sum(d_cb, axis=1, keepdims=True)
        grad_buf[:, FEAT_CC:FEAT_CC + 1] = jnp.sum(d_cc, axis=1, keepdims=True)
        grad_buf[:, FEAT_R:FEAT_B + 1] = d_col
        grad_buf[:, FEAT_OPA:FEAT_OPA + 1] = jnp.sum(d_opa, axis=1, keepdims=True)
        grad_buf[:, FEAT_OPA + 1:] = jnp.zeros(
            (BLEND_CHUNK, FEAT_WIDTH - FEAT_OPA - 1), jnp.float32
        )
        out_copy = pltpu.make_async_copy(
            grad_buf,
            grads_out.at[pl.ds(start + k * BLEND_CHUNK, BLEND_CHUNK)],
            grad_sem,
        )
        out_copy.start()
        out_copy.wait()

        t_naive = t_naive * jnp.exp(jnp.sum(lg, axis=0, keepdims=True))
        r_carry = r_carry - jnp.sum(contrib, axis=0, keepdims=True)
        return t_naive, r_carry

    init = (jnp.ones((1, PIX), jnp.float32), r_init_ref[0])
    jax.lax.fori_loop(0, nchunks, body, init)


def _common_grid_spec(grid: TileGrid, extra_in_specs, out_specs, scratch):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid.num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] + extra_in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )


@functools.partial(
    jax.jit, static_argnames=("grid", "interpret")
)
def blend_forward(tile_starts, inst_feat_pad, grid: TileGrid, interpret: bool = False):
    """Returns (tile_rgb [T, 3, PIX], tile_T [T, 1, PIX])."""
    kernel = functools.partial(
        _fwd_kernel, tiles_x=grid.tiles_x, width=grid.width, height=grid.height
    )
    grid_spec = _common_grid_spec(
        grid,
        [],
        (
            pl.BlockSpec((1, 3, PIX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PIX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        [
            pltpu.VMEM((2, BLEND_CHUNK, FEAT_WIDTH), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((grid.num_tiles, 3, PIX), jnp.float32),
            jax.ShapeDtypeStruct((grid.num_tiles, 1, PIX), jnp.float32),
        ),
        interpret=interpret,
    )(tile_starts, inst_feat_pad)


@functools.partial(jax.jit, static_argnames=("grid", "interpret"))
def blend_forward_counting(tile_starts, inst_feat_pad, grid: TileGrid, interpret: bool = False):
    """Forward + per-instance (imp, hit-count) stats. Returns
    (tile_rgb, tile_T, imp [M_pad, 1], cnt [M_pad, 1])."""
    m_pad = inst_feat_pad.shape[0]
    kernel = functools.partial(
        _count_kernel, tiles_x=grid.tiles_x, width=grid.width, height=grid.height
    )
    grid_spec = _common_grid_spec(
        grid,
        [],
        (
            pl.BlockSpec((1, 3, PIX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PIX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        [
            pltpu.VMEM((2, BLEND_CHUNK, FEAT_WIDTH), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((BLEND_CHUNK, 2), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((grid.num_tiles, 3, PIX), jnp.float32),
            jax.ShapeDtypeStruct((grid.num_tiles, 1, PIX), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tile_starts, inst_feat_pad)


@functools.partial(jax.jit, static_argnames=("grid", "interpret"))
def blend_backward(tile_starts, inst_feat_pad, tile_g_rgb, tile_r_init, grid: TileGrid, interpret: bool = False):
    """Per-instance feature gradients [M_pad, FEAT_WIDTH]."""
    m_pad = inst_feat_pad.shape[0]
    kernel = functools.partial(
        _bwd_kernel, tiles_x=grid.tiles_x, width=grid.width, height=grid.height
    )
    grid_spec = _common_grid_spec(
        grid,
        [
            pl.BlockSpec((1, 3, PIX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PIX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        pl.BlockSpec(memory_space=pltpu.ANY),
        [
            pltpu.VMEM((2, BLEND_CHUNK, FEAT_WIDTH), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((BLEND_CHUNK, FEAT_WIDTH), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, FEAT_WIDTH), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tile_starts, inst_feat_pad, tile_g_rgb, tile_r_init)
