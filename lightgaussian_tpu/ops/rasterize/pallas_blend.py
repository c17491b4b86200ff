"""Pallas TPU kernels for per-tile front-to-back alpha blending (fwd + bwd).

TPU-native re-design of the CUDA rasterizer's renderCUDA / renderBackwardCUDA
(SURVEY.md §2.1a): one grid program per 32x32-pixel tile; each program streams
its (tile, depth)-sorted instance range from HBM in double-buffered 128-wide
chunks and blends all 1024 pixels at once:

- instance chunks live in HBM as [16, 128] feature-major blocks (perfectly
  (8,128)-tiled; transposed to instance-major [128, 16] in-kernel),
- within-chunk transmittance prefixes are log-depth Hillis-Steele scans of
  (1 - alpha) products on the VPU (7 shifted multiplies — no sequential
  per-splat loop, no transcendentals, and exact CUDA-style f32 products
  instead of exp(sum(log1p))),
- color accumulation is a [3,128]x[128,1024] matmul,
- the reference's sequential early-stop (T*(1-a) < 1e-4 freezes T) is the
  equivalent monotone masked form proved in reference.py,
- the backward re-walks chunks *front-to-back* carrying the per-pixel
  "remaining contribution" scalar, so no reverse storage is needed, and
  per-instance gradients go to chunk-exclusive HBM blocks (segment-summed to
  Gaussians outside the kernel — no atomics).

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
    INST_CHUNK,
    TILE_SIZE,
    TileGrid,
)
from lightgaussian_tpu.ops.rasterize.projection import ALPHA_EPS, MAX_ALPHA, T_EPS

BLEND_CHUNK = INST_CHUNK  # 128 instances blended per inner step
PIX = TILE_SIZE * TILE_SIZE  # 1024 pixels/tile = 8 sublanes x 128 lanes of f32


def _pixel_coords(tile_id, tiles_x):
    """Per-tile pixel coordinate rows: px, py of shape [1, PIX] (float32)."""
    tx = tile_id % tiles_x
    ty = tile_id // tiles_x
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    px = (tx * TILE_SIZE + lane % TILE_SIZE).astype(jnp.float32)
    py = (ty * TILE_SIZE + lane // TILE_SIZE).astype(jnp.float32)
    return px, py


def _chunk_alpha(f, px, py, pix_valid):
    """Shared fwd/bwd per-chunk alpha computation.

    f: [G, FEAT_WIDTH] instance-major features (padding rows are all-zero, so
    their alpha is 0 and they are inert). Returns (alpha [G,PIX], extras).
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
    elig = (power <= 0.0) & (alpha >= ALPHA_EPS) & pix_valid
    alpha = jnp.where(elig, alpha, 0.0)
    return alpha, dict(
        dx=dx, dy=dy, g_exp=g_exp, alpha_raw=alpha_raw, elig=elig,
        ca=ca, cb=cb, cc=cc, opa=opa,
    )


def _shift_down(x, s: int, fill: float):
    """x[i] <- x[i - s] along axis 0, top s rows <- fill (static s)."""
    rolled = jnp.roll(x, s, axis=0)
    ri = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(ri < s, fill, rolled)


def _inclusive_scan_mul(x):
    """Hillis-Steele inclusive prefix product along axis 0 (log-depth)."""
    s = 1
    while s < x.shape[0]:
        x = x * _shift_down(x, s, 1.0)
        s *= 2
    return x


def _inclusive_scan_add(x):
    """Hillis-Steele inclusive prefix sum along axis 0 (log-depth)."""
    s = 1
    while s < x.shape[0]:
        x = x + _shift_down(x, s, 0.0)
        s *= 2
    return x


def _make_chunk_dma(inst_hbm, buf, sems):
    def get_dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            inst_hbm.at[chunk_idx], buf.at[slot], sems.at[slot]
        )

    return get_dma


def _fwd_kernel(
    starts_ref,  # scalar prefetch: [T+1] int32 (multiples of 128)
    inst_hbm,  # [CAP/128, FEAT_WIDTH, 128] f32 (HBM)
    rgb_out,  # [1, 3, PIX] VMEM block
    t_out,  # [1, 1, PIX] VMEM block
    buf,  # VMEM scratch (2, FEAT_WIDTH, 128)
    sems,  # DMA sems (2,)
    *,
    tiles_x: int,
    width: int,
    height: int,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    chunk_base = start // BLEND_CHUNK
    nchunks = (starts_ref[t + 1] - start) // BLEND_CHUNK

    px, py = _pixel_coords(t, tiles_x)
    pix_valid = (px < width) & (py < height)
    get_dma = _make_chunk_dma(inst_hbm, buf, sems)

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, chunk_base).start()

    def body(state):
        k, t_naive, t_act, rgb = state
        slot = k % 2

        @pl.when(k + 1 < nchunks)
        def _():
            get_dma((k + 1) % 2, chunk_base + k + 1).start()

        get_dma(slot, chunk_base + k).wait()
        f = buf[slot].T  # [128, 16] instance-major
        alpha, _ = _chunk_alpha(f, px, py, pix_valid)
        om = 1.0 - alpha
        incl = _inclusive_scan_mul(om)  # [G, PIX] prod_{j<=i}(1-a_j)
        t_i = t_naive * _shift_down(incl, 1, 1.0)
        apply = (t_i * om) >= T_EPS
        w = jnp.where(apply, alpha * t_i, 0.0)
        col = f[:, FEAT_R:FEAT_B + 1]  # [G, 3]
        rgb = rgb + jax.lax.dot_general(
            col, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )
        t_naive = t_naive * incl[BLEND_CHUNK - 1:BLEND_CHUNK]
        # prod of applied om == incl at the last applied row; apply is a
        # monotone prefix and incl is non-increasing, so that's a min-reduce
        # (Mosaic has no reduce_prod).
        t_act = t_act * jnp.min(jnp.where(apply, incl, 1.0), axis=0, keepdims=True)
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
        get_dma(k_end % 2, chunk_base + k_end).wait()

    rgb_out[0] = rgb
    t_out[0] = t_act


def _count_kernel(
    starts_ref,
    inst_hbm,
    rgb_out,
    t_out,
    imp_out,  # [CAP/128, 1, 128] f32 (HBM) — per-instance alpha*T mass
    cnt_out,  # [CAP/128, 1, 128] f32 (HBM) — per-instance pixel hit count
    buf,
    sems,
    stat_buf,  # VMEM scratch (2, 1, 128)
    stat_sems,  # DMA sems (2,)
    *,
    tiles_x: int,
    width: int,
    height: int,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    chunk_base = start // BLEND_CHUNK
    nchunks = (starts_ref[t + 1] - start) // BLEND_CHUNK

    px, py = _pixel_coords(t, tiles_x)
    pix_valid = (px < width) & (py < height)
    get_dma = _make_chunk_dma(inst_hbm, buf, sems)

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, chunk_base).start()

    def body(k, state):
        t_naive, t_act, rgb = state
        slot = k % 2

        @pl.when(k + 1 < nchunks)
        def _():
            get_dma((k + 1) % 2, chunk_base + k + 1).start()

        get_dma(slot, chunk_base + k).wait()
        f = buf[slot].T
        alpha, _ = _chunk_alpha(f, px, py, pix_valid)
        om = 1.0 - alpha
        incl = _inclusive_scan_mul(om)
        t_i = t_naive * _shift_down(incl, 1, 1.0)
        apply = (t_i * om) >= T_EPS
        w = jnp.where(apply, alpha * t_i, 0.0)
        col = f[:, FEAT_R:FEAT_B + 1]
        rgb = rgb + jax.lax.dot_general(
            col, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )

        # Per-instance stats -> chunk-exclusive HBM blocks (no races).
        stat_buf[0] = jnp.sum(w, axis=1, keepdims=True).T  # [1, 128]
        stat_buf[1] = jnp.sum((w > 0.0).astype(jnp.float32), axis=1, keepdims=True).T
        imp_copy = pltpu.make_async_copy(
            stat_buf.at[0], imp_out.at[chunk_base + k], stat_sems.at[0]
        )
        cnt_copy = pltpu.make_async_copy(
            stat_buf.at[1], cnt_out.at[chunk_base + k], stat_sems.at[1]
        )
        imp_copy.start()
        cnt_copy.start()
        imp_copy.wait()
        cnt_copy.wait()

        t_naive = t_naive * incl[BLEND_CHUNK - 1:BLEND_CHUNK]
        # prod of applied om == incl at the last applied row; apply is a
        # monotone prefix and incl is non-increasing, so that's a min-reduce
        # (Mosaic has no reduce_prod).
        t_act = t_act * jnp.min(jnp.where(apply, incl, 1.0), axis=0, keepdims=True)
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
    grads_out,  # [CAP/128, FEAT_WIDTH, 128] f32 (HBM): per-instance grads
    buf,
    sems,
    grad_buf,  # VMEM scratch (FEAT_WIDTH, 128)
    grad_sem,
    *,
    tiles_x: int,
    width: int,
    height: int,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    chunk_base = start // BLEND_CHUNK
    nchunks = (starts_ref[t + 1] - start) // BLEND_CHUNK

    px, py = _pixel_coords(t, tiles_x)
    pix_valid = (px < width) & (py < height)
    g = g_rgb_ref[0]  # [3, PIX]
    get_dma = _make_chunk_dma(inst_hbm, buf, sems)

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, chunk_base).start()

    def body(k, state):
        t_naive, r_carry = state  # [1,PIX], [1,PIX]
        slot = k % 2

        @pl.when(k + 1 < nchunks)
        def _():
            get_dma((k + 1) % 2, chunk_base + k + 1).start()

        get_dma(slot, chunk_base + k).wait()
        f = buf[slot].T
        alpha, ex = _chunk_alpha(f, px, py, pix_valid)
        om = 1.0 - alpha
        incl = _inclusive_scan_mul(om)
        t_i = t_naive * _shift_down(incl, 1, 1.0)
        apply = (t_i * om) >= T_EPS
        w = jnp.where(apply, alpha * t_i, 0.0)

        col = f[:, FEAT_R:FEAT_B + 1]  # [G, 3]
        cw = jnp.dot(col, g, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # [G, PIX]
        contrib = cw * w
        incl_prefix = _inclusive_scan_add(contrib)
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
        # d(power)/d(dx) = -(ca*dx + cb*dy); dx = px - mx => d/d(mx) flips sign.
        d_mx = d_power * (ex["ca"] * dx + ex["cb"] * dy)
        d_my = d_power * (ex["cc"] * dy + ex["cb"] * dx)

        d_col = jax.lax.dot_general(
            w, g, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
        )  # [G, 3]

        def rsum(x):  # [G, PIX] -> [G, 1]
            return jnp.sum(x, axis=1, keepdims=True)

        pad = jnp.zeros((BLEND_CHUNK, FEAT_WIDTH - FEAT_OPA - 1), jnp.float32)
        gmat = jnp.concatenate(
            [rsum(d_mx), rsum(d_my), rsum(d_ca), rsum(d_cb), rsum(d_cc),
             d_col, rsum(d_opa), pad],
            axis=1,
        )  # [G, FEAT_WIDTH]
        grad_buf[:] = gmat.T  # [FEAT_WIDTH, 128]
        out_copy = pltpu.make_async_copy(
            grad_buf, grads_out.at[chunk_base + k], grad_sem
        )
        out_copy.start()
        out_copy.wait()

        t_naive = t_naive * incl[BLEND_CHUNK - 1:BLEND_CHUNK]
        r_carry = r_carry - incl_prefix[BLEND_CHUNK - 1:BLEND_CHUNK]
        return t_naive, r_carry

    init = (jnp.ones((1, PIX), jnp.float32), r_init_ref[0])
    jax.lax.fori_loop(0, nchunks, body, init)


def _common_grid_spec(grid: TileGrid, extra_in_specs, out_specs, scratch):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid.num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] + extra_in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )


@functools.partial(jax.jit, static_argnames=("grid", "interpret"))
def blend_forward(tile_starts, inst_chunks, grid: TileGrid, interpret: bool = False):
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
            pltpu.VMEM((2, FEAT_WIDTH, BLEND_CHUNK), jnp.float32),
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
    )(tile_starts, inst_chunks)


@functools.partial(jax.jit, static_argnames=("grid", "interpret"))
def blend_forward_counting(tile_starts, inst_chunks, grid: TileGrid, interpret: bool = False):
    """Forward + per-instance (imp, hit-count) stats. Returns
    (tile_rgb, tile_T, imp [CAP/128, 1, 128], cnt [CAP/128, 1, 128])."""
    ncap = inst_chunks.shape[0]
    kernel = functools.partial(
        _count_kernel, tiles_x=grid.tiles_x, width=grid.width, height=grid.height
    )
    grid_spec = _common_grid_spec(
        grid,
        [],
        (
            pl.BlockSpec((1, 3, PIX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PIX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        [
            pltpu.VMEM((2, FEAT_WIDTH, BLEND_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, 1, BLEND_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((grid.num_tiles, 3, PIX), jnp.float32),
            jax.ShapeDtypeStruct((grid.num_tiles, 1, PIX), jnp.float32),
            jax.ShapeDtypeStruct((ncap, 1, BLEND_CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((ncap, 1, BLEND_CHUNK), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tile_starts, inst_chunks)


@functools.partial(jax.jit, static_argnames=("grid", "interpret"))
def blend_backward(tile_starts, inst_chunks, tile_g_rgb, tile_r_init, grid: TileGrid, interpret: bool = False):
    """Per-instance feature gradients [CAP/128, FEAT_WIDTH, 128]."""
    ncap = inst_chunks.shape[0]
    kernel = functools.partial(
        _bwd_kernel, tiles_x=grid.tiles_x, width=grid.width, height=grid.height
    )
    grid_spec = _common_grid_spec(
        grid,
        [
            pl.BlockSpec((1, 3, PIX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PIX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        pl.BlockSpec(memory_space=pltpu.HBM),
        [
            pltpu.VMEM((2, FEAT_WIDTH, BLEND_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((FEAT_WIDTH, BLEND_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ncap, FEAT_WIDTH, BLEND_CHUNK), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tile_starts, inst_chunks, tile_g_rgb, tile_r_init)
