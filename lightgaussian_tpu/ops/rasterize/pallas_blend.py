"""Pallas TPU kernels for per-tile front-to-back alpha blending (fwd + bwd).

TPU-native re-design of the CUDA rasterizer's renderCUDA / renderBackwardCUDA
(SURVEY.md §2.1a): one grid program per 32x32-pixel tile; each program streams
its (tile, depth)-sorted instance range from HBM in double-buffered 128-wide
chunks and blends all 1024 pixels at once:

- instance chunks live in HBM as [16, 128] feature-major blocks (perfectly
  (8,128)-tiled; transposed to instance-major [128, 16] in-kernel),
- tile ranges are RAW offsets into the compact sorted buffer: a chunk at a
  tile boundary is read by both adjacent tiles, each masking out the rows it
  does not own (per-instance padding/scatter in XLA costs ~6 ns/element —
  far more than re-reading ~1 extra 8 KiB chunk per tile),
- within-chunk transmittance prefixes are log-depth Hillis-Steele scans of
  (1 - alpha) products on the VPU (7 shifted multiplies — no sequential
  per-splat loop, no transcendentals, and exact CUDA-style f32 products
  instead of exp(sum(log1p))),
- color accumulation is a [3,128]x[128,1024] matmul,
- the reference's sequential early-stop (T*(1-a) < 1e-4 freezes T) is the
  equivalent monotone masked form proved in reference.py,
- the backward re-walks chunks *front-to-back* carrying the per-pixel
  "remaining contribution" scalar, so no reverse storage is needed; the five
  geometric gradients (d_mean2d, d_conic) come from six shared-subexpression
  lane-reductions of {d_power, d_power*dx, d_power*dy} plus [G, 1] scalar
  algebra (~12 fewer [G, PIX] VPU passes than the term-by-term form; an MXU
  moment matmul was tried and loses — N=8 outputs pad to a full 128-lane MXU
  pass), and per-instance gradients go to per-chunk HBM blocks (a tile's
  unaligned first chunk read-modify-writes the previous tile's contribution;
  the sequential TPU grid makes that race-free), segment-summed to Gaussians
  outside the kernel — no atomics,
- the backward early-exits on transmittance saturation like the forward,
  zero-filling the skipped chunks' gradient blocks.

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

_HI = jax.lax.Precision.HIGHEST


def _tile_origin(tile_id, tiles_x):
    tx = tile_id % tiles_x
    ty = tile_id // tiles_x
    return (tx * TILE_SIZE).astype(jnp.float32), (ty * TILE_SIZE).astype(jnp.float32)


def _local_coords():
    """Tile-local pixel coordinate rows: x, y of shape [1, PIX] in [0, 32)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    lx = (lane % TILE_SIZE).astype(jnp.float32)
    ly = (lane // TILE_SIZE).astype(jnp.float32)
    return lx, ly


def _range_info(starts_ref, t):
    """Raw [start, end) range -> (chunk_base, nchunks, start, end)."""
    start = starts_ref[t]
    end = starts_ref[t + 1]
    chunk_base = start // BLEND_CHUNK
    nchunks = jnp.where(
        end > start, (end + BLEND_CHUNK - 1) // BLEND_CHUNK - chunk_base, 0
    )
    return chunk_base, nchunks, start, end


def _row_valid(chunk_base, k, start, end):
    """[G, 1] mask of rows of chunk k owned by this tile (boundary masking)."""
    row = (chunk_base + k) * BLEND_CHUNK + jax.lax.broadcasted_iota(
        jnp.int32, (BLEND_CHUNK, 1), 0
    )
    return (row >= start) & (row < end)


def _chunk_alpha(f, lx, ly, ox, oy, pix_valid, row_valid):
    """Shared fwd/bwd per-chunk alpha computation in tile-local coordinates.

    f: [G, FEAT_WIDTH] instance-major features (padding rows are all-zero, so
    their alpha is 0 and they are inert). Returns (alpha [G,PIX], extras).
    """
    mx = f[:, FEAT_MX:FEAT_MX + 1] - ox
    my = f[:, FEAT_MY:FEAT_MY + 1] - oy
    ca = f[:, FEAT_CA:FEAT_CA + 1]
    cb = f[:, FEAT_CB:FEAT_CB + 1]
    cc = f[:, FEAT_CC:FEAT_CC + 1]
    opa = f[:, FEAT_OPA:FEAT_OPA + 1]
    dx = lx - mx  # [G, PIX]
    dy = ly - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g_exp = jnp.exp(power)
    alpha_raw = opa * g_exp
    alpha = jnp.minimum(MAX_ALPHA, alpha_raw)
    elig = (power <= 0.0) & (alpha >= ALPHA_EPS) & pix_valid & row_valid
    alpha = jnp.where(elig, alpha, 0.0)
    return alpha, dict(
        dx=dx, dy=dy, g_exp=g_exp, alpha_raw=alpha_raw, elig=elig,
        ca=ca, cb=cb, cc=cc, opa=opa,
    )


def _shift_down(x, s: int, fill: float):
    """x[i] <- x[i - s] along axis 0, top s rows <- fill (static s)."""
    top = jnp.full((s,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([top, x[: x.shape[0] - s]], axis=0)


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


def _pix_valid(t, tiles_x, width, height):
    ox, oy = _tile_origin(t, tiles_x)
    lx, ly = _local_coords()
    return lx, ly, ox, oy, (lx + ox < width) & (ly + oy < height)


def _fwd_kernel(
    starts_ref,  # scalar prefetch: [T+1] int32 raw offsets
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
    chunk_base, nchunks, start, end = _range_info(starts_ref, t)
    lx, ly, ox, oy, pix_valid = _pix_valid(t, tiles_x, width, height)
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
        alpha, _ = _chunk_alpha(
            f, lx, ly, ox, oy, pix_valid, _row_valid(chunk_base, k, start, end)
        )
        om = 1.0 - alpha
        incl = _inclusive_scan_mul(om)  # [G, PIX] prod_{j<=i}(1-a_j)
        t_i = t_naive * _shift_down(incl, 1, 1.0)
        apply = (t_i * om) >= T_EPS
        w = jnp.where(apply, alpha * t_i, 0.0)
        col = f[:, FEAT_R:FEAT_B + 1]  # [G, 3]
        rgb = rgb + jax.lax.dot_general(
            col, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=_HI
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

    # Seed t_naive = 0 on out-of-image lanes: their alpha is always 0, so
    # they'd otherwise pin max(t_naive) at 1 and edge tiles (e.g. the whole
    # bottom row at 1080p on a 32-padded grid) could never early-exit. w and
    # t_act are unaffected (alpha and apply are already masked by pix_valid).
    init = (
        jnp.int32(0),
        jnp.where(pix_valid, 1.0, 0.0),
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


def _fast_kernel(
    starts_ref,
    inst_hbm,
    rgb_out,
    t_out,
    buf,
    sems,
    *,
    tiles_x: int,
    width: int,
    height: int,
):
    """Render-only forward: `_fwd_kernel` minus the masked-min `t_act`
    reduction (a sublane min-reduce + where + mul per chunk, ~20% of forward
    VPU passes — scripts/roofline.py). The background weight uses the naive
    transmittance product instead of the applied-contributions product; they
    diverge only once a pixel passes the early-stop threshold, where both are
    <= T_EPS / (1 - MAX_ALPHA) = 1e-2 (worst case; measured max image delta
    ~4e-4 on dense scenes, below PNG quantization 1/255) — gated in
    tests/test_rasterizer.py. For inference paths only (render_set /
    trajectories / FPS benches); training and the parity oracle keep the
    exact kernel."""
    t = pl.program_id(0)
    chunk_base, nchunks, start, end = _range_info(starts_ref, t)
    lx, ly, ox, oy, pix_valid = _pix_valid(t, tiles_x, width, height)
    get_dma = _make_chunk_dma(inst_hbm, buf, sems)

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, chunk_base).start()

    def body(state):
        k, t_naive, rgb = state
        slot = k % 2

        @pl.when(k + 1 < nchunks)
        def _():
            get_dma((k + 1) % 2, chunk_base + k + 1).start()

        get_dma(slot, chunk_base + k).wait()
        f = buf[slot].T
        alpha, _ = _chunk_alpha(
            f, lx, ly, ox, oy, pix_valid, _row_valid(chunk_base, k, start, end)
        )
        om = 1.0 - alpha
        incl = _inclusive_scan_mul(om)
        t_i = t_naive * _shift_down(incl, 1, 1.0)
        apply = (t_i * om) >= T_EPS
        w = jnp.where(apply, alpha * t_i, 0.0)
        col = f[:, FEAT_R:FEAT_B + 1]
        rgb = rgb + jax.lax.dot_general(
            col, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=_HI
        )
        t_naive = t_naive * incl[BLEND_CHUNK - 1:BLEND_CHUNK]
        return k + 1, t_naive, rgb

    def cond(state):
        k, t_naive, _ = state
        return (k < nchunks) & (jnp.max(t_naive) >= T_EPS)

    init = (
        jnp.int32(0),
        jnp.where(pix_valid, 1.0, 0.0),
        jnp.zeros((3, PIX), jnp.float32),
    )
    k_end, t_naive, rgb = jax.lax.while_loop(cond, body, init)

    @pl.when(k_end < nchunks)
    def _():
        get_dma(k_end % 2, chunk_base + k_end).wait()

    rgb_out[0] = rgb
    # Out-of-image lanes were seeded 0 for the early exit; restore 1 so the
    # padded-region background weight matches the exact kernel's convention.
    t_out[0] = jnp.where(pix_valid, t_naive, 1.0)


@functools.partial(jax.jit, static_argnames=("grid", "interpret"))
def blend_forward_fast(tile_starts, inst_chunks, grid: TileGrid, interpret: bool = False):
    """Render-only forward (see `_fast_kernel`). Returns
    (tile_rgb [T, 3, PIX], tile_T_naive [T, 1, PIX])."""
    kernel = functools.partial(
        _fast_kernel, tiles_x=grid.tiles_x, width=grid.width, height=grid.height
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


def _is_shared(k, nchunks, start, end):
    """Chunk k already holds a PREVIOUS tile's rows -> accumulate, don't store.

    Only the first chunk of an unaligned range qualifies: earlier tiles (which
    own rows [chunk_start, start) and run first on the sequential grid) have
    already stored it. A trailing shared chunk is plain-stored — the NEXT tile
    is the one that accumulates into it.
    """
    del nchunks, end
    return (k == 0) & (start % BLEND_CHUNK != 0)


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
    rmw_buf,  # VMEM scratch (2, 1, 128) for shared-chunk accumulation
    rmw_sems,  # DMA sems (2,)
    *,
    tiles_x: int,
    width: int,
    height: int,
):
    t = pl.program_id(0)
    chunk_base, nchunks, start, end = _range_info(starts_ref, t)
    lx, ly, ox, oy, pix_valid = _pix_valid(t, tiles_x, width, height)
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
        alpha, _ = _chunk_alpha(
            f, lx, ly, ox, oy, pix_valid, _row_valid(chunk_base, k, start, end)
        )
        om = 1.0 - alpha
        incl = _inclusive_scan_mul(om)
        t_i = t_naive * _shift_down(incl, 1, 1.0)
        apply = (t_i * om) >= T_EPS
        w = jnp.where(apply, alpha * t_i, 0.0)
        col = f[:, FEAT_R:FEAT_B + 1]
        rgb = rgb + jax.lax.dot_general(
            col, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=_HI
        )

        # Per-instance stats -> per-chunk HBM blocks. Boundary chunks shared
        # with the previous/next tile accumulate (their row sets are disjoint,
        # and the sequential grid orders the writes).
        stat_buf[0] = jnp.sum(w, axis=1, keepdims=True).T  # [1, 128]
        stat_buf[1] = jnp.sum((w > 0.0).astype(jnp.float32), axis=1, keepdims=True).T

        @pl.when(_is_shared(k, nchunks, start, end))
        def _():
            imp_rd = pltpu.make_async_copy(
                imp_out.at[chunk_base + k], rmw_buf.at[0], rmw_sems.at[0]
            )
            cnt_rd = pltpu.make_async_copy(
                cnt_out.at[chunk_base + k], rmw_buf.at[1], rmw_sems.at[1]
            )
            imp_rd.start()
            cnt_rd.start()
            imp_rd.wait()
            cnt_rd.wait()
            stat_buf[0] = stat_buf[0] + rmw_buf[0]
            stat_buf[1] = stat_buf[1] + rmw_buf[1]

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
    rmw_buf,  # VMEM scratch (FEAT_WIDTH, 128) for shared-chunk accumulation
    rmw_sem,
    *,
    tiles_x: int,
    width: int,
    height: int,
):
    t = pl.program_id(0)
    chunk_base, nchunks, start, end = _range_info(starts_ref, t)
    lx, ly, ox, oy, pix_valid = _pix_valid(t, tiles_x, width, height)
    g = g_rgb_ref[0]  # [3, PIX]
    get_dma = _make_chunk_dma(inst_hbm, buf, sems)

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, chunk_base).start()

    def body(state):
        k, t_naive, r_carry = state  # [1,PIX], [1,PIX]
        slot = k % 2

        @pl.when(k + 1 < nchunks)
        def _():
            get_dma((k + 1) % 2, chunk_base + k + 1).start()

        get_dma(slot, chunk_base + k).wait()
        f = buf[slot].T
        alpha, ex = _chunk_alpha(
            f, lx, ly, ox, oy, pix_valid, _row_valid(chunk_base, k, start, end)
        )
        om = 1.0 - alpha
        # Issue the MXU dot before the (VPU-only) scans so it overlaps them.
        col = f[:, FEAT_R:FEAT_B + 1]  # [G, 3]
        cw = jnp.dot(col, g, preferred_element_type=jnp.float32, precision=_HI)  # [G, PIX]
        incl = _inclusive_scan_mul(om)
        t_i = t_naive * _shift_down(incl, 1, 1.0)
        apply = (t_i * om) >= T_EPS
        w = jnp.where(apply, alpha * t_i, 0.0)
        contrib = cw * w
        incl_prefix = _inclusive_scan_add(contrib)
        r_i = r_carry - incl_prefix  # remaining contribution after i (incl. bg)
        d_alpha = cw * t_i - r_i / (1.0 - alpha)

        # Chain through alpha = min(0.99, opa * exp(power)); the clamp and the
        # eligibility gates are non-differentiable cutoffs (as in CUDA).
        # Masks fold cheaply: `alpha` is already zero on ineligible/masked
        # lanes (so multiplying by it kills them — alpha == alpha_raw on the
        # surviving lanes), leaving one select each for the clamp and the
        # `apply` cutoff (whose unmasked d_alpha holds garbage from w == 0).
        live = (ex["alpha_raw"] < MAX_ALPHA) & apply
        d_power = jnp.where(live, d_alpha, 0.0) * alpha  # [G, PIX]

        dxf, dyf = ex["dx"], ex["dy"]
        # Shared-subexpression moments: q1 = d_power*dx, q2 = d_power*dy give
        # ALL five geometric grads from six lane-reductions + [G, 1] scalar
        # algebra (d_mx = ca*Sum q1 + cb*Sum q2, d_opa = Sum d_power / opa,
        # ...) — ~12 fewer [G, PIX] VPU passes than the term-by-term form.
        q1 = d_power * dxf
        q2 = d_power * dyf

        def rsum(x):  # [G, PIX] -> [G, 1]
            return jnp.sum(x, axis=1, keepdims=True)

        m0 = rsum(d_power)
        cx = rsum(q1)
        cy = rsum(q2)
        d_ca = -0.5 * rsum(q1 * dxf)
        d_cb = -rsum(q1 * dyf)
        d_cc = -0.5 * rsum(q2 * dyf)
        # d(power)/d(dx) = -(ca*dx + cb*dy); dx = x - mx => d/d(mx) flips sign.
        d_mx = ex["ca"] * cx + ex["cb"] * cy
        d_my = ex["cc"] * cy + ex["cb"] * cx
        # d_opa = Sum d_alpha_raw * g_exp = (Sum d_power) / opa.
        d_opa = m0 / jnp.maximum(ex["opa"], 1e-12)

        d_col = jax.lax.dot_general(
            w, g, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=_HI
        )  # [G, 3]

        pad = jnp.zeros((BLEND_CHUNK, FEAT_WIDTH - FEAT_OPA - 1), jnp.float32)
        gmat = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_col, d_opa, pad], axis=1
        )  # [G, FEAT_WIDTH]
        grad_buf[:] = gmat.T  # [FEAT_WIDTH, 128]

        @pl.when(_is_shared(k, nchunks, start, end))
        def _():
            rd = pltpu.make_async_copy(
                grads_out.at[chunk_base + k], rmw_buf, rmw_sem
            )
            rd.start()
            rd.wait()
            grad_buf[:] = grad_buf[:] + rmw_buf[:]

        out_copy = pltpu.make_async_copy(
            grad_buf, grads_out.at[chunk_base + k], grad_sem
        )
        out_copy.start()
        out_copy.wait()

        t_naive = t_naive * incl[BLEND_CHUNK - 1:BLEND_CHUNK]
        r_carry = r_carry - incl_prefix[BLEND_CHUNK - 1:BLEND_CHUNK]
        return k + 1, t_naive, r_carry

    def cond(state):
        k, t_naive, _ = state
        return (k < nchunks) & (jnp.max(t_naive) >= T_EPS)

    # Out-of-image lanes seed t_naive = 0 so edge tiles can early-exit (their
    # d_power is already pix_valid-masked; r on those lanes is zero-padded).
    init = (jnp.int32(0), jnp.where(pix_valid, 1.0, 0.0), r_init_ref[0])
    k_end, _, _ = jax.lax.while_loop(cond, body, init)

    # Early exit: drain the in-flight DMA, then zero-fill the skipped chunks
    # (their rows are saturated => zero grads, but the buffer is unwritten and
    # the next tile may accumulate into the trailing shared chunk).
    @pl.when(k_end < nchunks)
    def _():
        get_dma(k_end % 2, chunk_base + k_end).wait()
        grad_buf[:] = jnp.zeros((FEAT_WIDTH, BLEND_CHUNK), jnp.float32)

        def zfill(k, carry):
            cp = pltpu.make_async_copy(grad_buf, grads_out.at[chunk_base + k], grad_sem)
            cp.start()
            cp.wait()
            return carry

        jax.lax.fori_loop(k_end, nchunks, zfill, 0)


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
    (tile_rgb, tile_T, imp [CAP/128, 1, 128], cnt [CAP/128, 1, 128]).

    imp/cnt rows past the live total are unwritten garbage; callers must
    gather through `Binning.pre_pos` and reduce only up to `gauss_cum` bounds
    (dead rows sit past every segment boundary; see tiled.py).
    """
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


@functools.partial(jax.jit, static_argnames=("chunks_per_block", "interpret"))
def unchunk_transpose(grad_chunks, chunks_per_block: int = 16, interpret: bool = False):
    """[NC, F, 128] chunk-major -> [NC*128, F] instance-major as a Pallas
    kernel — an A/B candidate against the XLA `transpose(0,2,1).reshape`
    form (`tiled._unchunk`): the sublane<->lane transpose is the only work,
    so whichever backend lowers the [F, 128] -> [128, F] permutation better
    wins. Measured in scripts/profile_bwd.py; only wired into the hot path
    on a measured end-to-end step win (PERF.md round-3 discipline)."""
    nc, f, g = grad_chunks.shape
    k = chunks_per_block
    while nc % k:
        k //= 2

    def kernel(src_ref, out_ref):
        x = src_ref[...]  # [k, F, 128]
        out_ref[...] = x.transpose(0, 2, 1).reshape(k * g, f)

    return pl.pallas_call(
        kernel,
        grid=(nc // k,),
        in_specs=[pl.BlockSpec((k, f, g), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((k * g, f), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nc * g, f), grad_chunks.dtype),
        interpret=interpret,
    )(grad_chunks)


@functools.partial(jax.jit, static_argnames=("grid", "interpret"))
def blend_backward(tile_starts, inst_chunks, tile_g_rgb, tile_r_init, grid: TileGrid, interpret: bool = False):
    """Per-instance feature gradients [CAP/128, FEAT_WIDTH, 128].

    Rows past the live total are unwritten garbage; callers must gather
    through `Binning.pre_pos` and reduce only up to `gauss_cum` bounds (dead
    rows sit past every segment boundary; see tiled.py and
    TestSegmentReduceGarbageTail).
    """
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
