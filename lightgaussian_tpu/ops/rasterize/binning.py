"""Tile binning: duplicate splats into a fixed-capacity, (tile, depth)-sorted
instance buffer — the static-shape XLA replacement for the CUDA rasterizer's
duplicateWithKeys + radix sort (SURVEY.md §2.1a "internal algorithm").

Dynamic per-Gaussian duplication becomes: exclusive-cumsum of per-Gaussian tile
counts + a scatter/cummax forward fill from instance slot -> source Gaussian.
Slots past the live total get a sentinel tile id that sorts to the end and
never lands in any tile's range. Sorting uses `jax.lax.sort` with a single
packed (tile | depth) u32 key.

The sorted buffer is COMPACT: tile ranges are raw offsets, NOT chunk-aligned.
Per-instance gathers/scatters are the dominant cost of binning on TPU
(~6 ns/element regardless of row width), so the layout avoids every optional
one: features are gathered straight into sorted order and the blend kernels
mask boundary rows of 128-instance chunks shared by adjacent tiles in-kernel
(see pallas_blend.py) instead of scattering into per-tile padded slots.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lightgaussian_tpu.ops.rasterize.projection import Splats

TILE_SIZE = 32  # 32x32 px = 1024 lanes = a full (8, 128) f32 vector register set.

# Packed per-instance feature columns.
FEAT_MX, FEAT_MY = 0, 1
FEAT_CA, FEAT_CB, FEAT_CC = 2, 3, 4
FEAT_R, FEAT_G, FEAT_B = 5, 6, 7
FEAT_OPA = 8
FEAT_WIDTH = 16

# Instances are blended in chunks of 128 and stored chunk-major in HBM as
# [CAP/128, FEAT_WIDTH, 128] (feature-on-sublane, instance-on-lane) — a
# perfectly (8,128)-tiled layout that supports dynamic-offset DMA; narrow
# trailing dims would be lane-padded by XLA and un-sliceable by Mosaic.
INST_CHUNK = 128


class TileGrid(NamedTuple):
    tiles_x: int
    tiles_y: int
    width: int
    height: int

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y


def make_grid(width: int, height: int, tile_size: int = TILE_SIZE) -> TileGrid:
    return TileGrid(
        tiles_x=-(-width // tile_size),
        tiles_y=-(-height // tile_size),
        width=width,
        height=height,
    )


def tile_rect(
    mean2d: jnp.ndarray,
    radius: jnp.ndarray,
    grid: TileGrid,
    tile_size: int = TILE_SIZE,
    conic: jnp.ndarray | None = None,
    opacity: jnp.ndarray | None = None,
):
    """Clamped [lo, hi) tile rectangle per Gaussian.

    The CUDA reference (`getRect`) uses the square box of the 3-sigma-max-
    eigenvalue circle. When `conic`/`opacity` are given, the box is tightened
    per axis to the *support of eligible alpha*: the blend kernel zeroes any
    contribution with alpha < ALPHA_EPS, and alpha = opa*exp(-q/2) with
    min_dy q(dx, dy) = dx^2/Sigma_xx, so pixels with
    |dx| > sqrt(2*ln(opa/ALPHA_EPS) * Sigma_xx) can never be eligible (same in
    y). Dropping those tiles changes nothing in the output (the oracle's
    eligibility mask already zeroes them) but substantially cuts duplicated
    instances for anisotropic and low-opacity splats; a +1 px margin absorbs
    f32 rounding at the boundary. Splats whose peak alpha is below ALPHA_EPS
    are dropped entirely.

    Returns lo_x, lo_y, hi_x, hi_y (int32) and count (0 where culled).
    """
    from lightgaussian_tpu.ops.rasterize.projection import ALPHA_EPS

    r = radius.astype(jnp.float32)
    alive = radius > 0
    if conic is not None:
        # Sigma = inv(conic): Sigma_xx = C/det, Sigma_yy = A/det.
        ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
        det = jnp.maximum(ca * cc - cb * cb, 1e-12)
        q_max = 2.0 * jnp.log(jnp.maximum(opacity, 1e-12) / ALPHA_EPS)
        alive = alive & (q_max > 0.0)
        q_max = jnp.maximum(q_max, 0.0)
        rx = jnp.minimum(r, jnp.sqrt(q_max * cc / det) + 1.0)
        ry = jnp.minimum(r, jnp.sqrt(q_max * ca / det) + 1.0)
    else:
        rx = ry = r
    lo_x = jnp.clip(jnp.floor((mean2d[:, 0] - rx) / tile_size), 0, grid.tiles_x).astype(jnp.int32)
    hi_x = jnp.clip(jnp.floor((mean2d[:, 0] + rx) / tile_size) + 1, 0, grid.tiles_x).astype(jnp.int32)
    lo_y = jnp.clip(jnp.floor((mean2d[:, 1] - ry) / tile_size), 0, grid.tiles_y).astype(jnp.int32)
    hi_y = jnp.clip(jnp.floor((mean2d[:, 1] + ry) / tile_size) + 1, 0, grid.tiles_y).astype(jnp.int32)
    count = jnp.where(
        alive,
        jnp.maximum(hi_x - lo_x, 0) * jnp.maximum(hi_y - lo_y, 0),
        0,
    )
    return lo_x, lo_y, hi_x, hi_y, count


# Rects with at most this many candidate tiles get exact per-tile ellipse
# intersection tests (a 32-bit slot bitmask); larger rects (rare, huge splats)
# fall back to keeping every rect tile. 16 already saturates the cut on
# isotropic scenes; 32 covers the large anisotropic splats of real scenes at
# +0.5 ms mask-build cost.
MAX_MASK_TILES = 32

# Tile pixel-center boxes are inflated by this many pixels before the
# intersection test: the continuous box min is evaluated with different f32
# operations than the kernel's per-pixel-center power, and the margin keeps
# the test strictly conservative (never drops a tile containing a pixel with
# alpha >= ALPHA_EPS). f32 rounding is ~1e-5 px at these magnitudes, so 0.25 px
# is far more than needed while costing ~1% of the cut.
_MASK_MARGIN_PX = 0.25


def _exact_tile_mask(
    splats: Splats,
    lo_x: jnp.ndarray,
    lo_y: jnp.ndarray,
    hi_x: jnp.ndarray,
    rect_count: jnp.ndarray,
    tile_size: int,
):
    """Exact ellipse-vs-tile intersection masks over row-major rect slots.

    The axis-aligned rect of `tile_rect` keeps every tile in the bounding box
    of the alpha support; for anisotropic / diagonal splats many corner tiles
    never contain an eligible pixel (the blend kernel zeroes alpha < ALPHA_EPS,
    i.e. q(dx,dy) > q_max with q = ca*dx^2 + 2*cb*dx*dy + cc*dy^2 and
    q_max = 2*ln(opa/ALPHA_EPS)). A tile intersects the support iff the MINIMUM
    of q over the tile's (margin-inflated) pixel box is <= q_max; that minimum
    has closed form: zero if the mean is inside the box, else the min over the
    four edges, where each edge is a clamped 1D quadratic. Dropped tiles
    contribute exactly zero in the blend (w == 0), so the rendered image and
    all gradients are unchanged up to f32 summation regrouping at chunk
    boundaries. This is the analogue of the per-tile culling the CUDA
    reference forgoes (its duplicateWithKeys keeps the full rect;
    SURVEY.md §2.1a) — on TPU every per-instance binning op scales with the
    instance count, so the ~10-30% cut pays for the [N, 32] test directly.

    Returns (mask uint32 [N], count int32 [N], use_mask bool [N]); where
    `use_mask` is False the mask is undefined and `count` falls back to the
    rect count (callers then map slot -> tile by rect index directly).
    """
    ca, cb, cc = splats.conic[:, 0], splats.conic[:, 1], splats.conic[:, 2]
    from lightgaussian_tpu.ops.rasterize.projection import ALPHA_EPS

    q_max = 2.0 * jnp.log(jnp.maximum(splats.opacity, 1e-12) / ALPHA_EPS)
    use_mask = (rect_count > 0) & (rect_count <= MAX_MASK_TILES)

    w = jnp.maximum(hi_x - lo_x, 1)
    j = jnp.arange(MAX_MASK_TILES, dtype=jnp.int32)[None, :]  # [1, 32]
    tx = lo_x[:, None] + j % w[:, None]
    ty = lo_y[:, None] + j // w[:, None]
    ts = float(tile_size)
    x0 = tx.astype(jnp.float32) * ts - _MASK_MARGIN_PX
    x1 = x0 + (ts - 1.0 + 2.0 * _MASK_MARGIN_PX)
    y0 = ty.astype(jnp.float32) * ts - _MASK_MARGIN_PX
    y1 = y0 + (ts - 1.0 + 2.0 * _MASK_MARGIN_PX)
    mx = splats.mean2d[:, 0:1]
    my = splats.mean2d[:, 1:2]
    caj, cbj, ccj = ca[:, None], cb[:, None], cc[:, None]

    def edge_x(xf):  # min over the edge x == xf, y free in the box
        dx = xf - mx
        dy = jnp.clip(-cbj * dx / jnp.maximum(ccj, 1e-12), y0 - my, y1 - my)
        return (caj * dx + 2.0 * cbj * dy) * dx + ccj * dy * dy

    def edge_y(yf):
        dy = yf - my
        dx = jnp.clip(-cbj * dy / jnp.maximum(caj, 1e-12), x0 - mx, x1 - mx)
        return (caj * dx + 2.0 * cbj * dy) * dx + ccj * dy * dy

    q_min = jnp.minimum(
        jnp.minimum(edge_x(x0), edge_x(x1)), jnp.minimum(edge_y(y0), edge_y(y1))
    )
    inside = (mx >= x0) & (mx <= x1) & (my >= y0) & (my <= y1)
    q_min = jnp.where(inside, 0.0, q_min)

    in_rect = j < rect_count[:, None]
    keep = in_rect & ((q_min <= q_max[:, None]) | ~use_mask[:, None])
    count = jnp.sum(keep, axis=1).astype(jnp.int32)
    count = jnp.where(use_mask, count, rect_count)

    # Set bits are disjoint, so the OR of the word is an exact uint32 sum.
    bit = jnp.uint32(1) << j.astype(jnp.uint32)
    mask = jnp.sum(keep.astype(jnp.uint32) * bit, axis=1, dtype=jnp.uint32)
    return mask, count, use_mask


def _kth_set_bit(mask: jnp.ndarray, l: jnp.ndarray) -> jnp.ndarray:
    """Index of the (l+1)-th set bit of a 32-bit mask.

    Branch-free binary search with `lax.population_count`; callers guarantee
    l < popcount(mask)."""
    word = mask
    l2 = l
    base = jnp.zeros_like(l)
    for wdt in (16, 8, 4, 2, 1):
        low = word & jnp.uint32((1 << wdt) - 1)
        c = jax.lax.population_count(low).astype(jnp.int32)
        go_hi = l2 >= c
        word = jnp.where(go_hi, word >> wdt, low)
        l2 = l2 - jnp.where(go_hi, c, 0)
        base = base + jnp.where(go_hi, wdt, 0)
    return base


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Binning:
    """Compact (tile, depth)-sorted instance buffer + raw per-tile ranges.

    Instances live at sorted positions [0, total); tile t owns the contiguous
    range [tile_starts[t], tile_starts[t+1]) — raw offsets, not chunk-aligned.
    Rows at positions >= total are all-zero features (alpha == 0, inert).

    `pre_pos` maps *pre-sort* instance slots (which are grouped by source
    Gaussian, ids ascending) to sorted positions; dead slots (>= total) map
    to dead sorted positions whose kernel rows are unread garbage (their
    cumsum positions sit past every segment boundary). This lets the backward
    reduce per-instance gradients with a
    row-GATHER (~8 ns/row, width-independent) + contiguous segment-sum; the
    tempting alternatives are far slower on TPU: a row-scatter of the grads
    costs ~6 ns/ELEMENT (~16x more for 16-wide rows, measured 102 -> 203 ms
    per step), and XLA's scatter-add segment sum is worse still.
    """

    inst_chunks: jnp.ndarray  # [CAP/128, FEAT_WIDTH, 128] f32, sorted compact
    pre_pos: jnp.ndarray  # [CAP] int32 pre-sort slot -> sorted position (None for forward_only binnings)
    gauss_cum: jnp.ndarray  # [N] int32 inclusive cumsum of per-Gaussian tile counts
    tile_starts: jnp.ndarray  # [T+1] int32 raw sorted-order offsets
    total: jnp.ndarray  # scalar int32: true live instances (overflow monitor)
    gid_sorted: jnp.ndarray  # [CAP] int32 sorted position -> Gaussian id (N = dead)


def segment_reduce_pre(values: jnp.ndarray, gauss_cum: jnp.ndarray, block: int = 2048) -> jnp.ndarray:
    """Sum pre-sort-ordered per-instance rows into per-Gaussian rows.

    Pre-sort instance slots of one Gaussian are contiguous ([cum-count, cum)),
    so the reduction is a two-level cumulative sum + boundary differences —
    ~10ms where XLA's scatter-add segment-sum takes ~250ms on 4M rows. The
    block level keeps f32 prefix error local (running totals reset per block).
    """
    m, f = values.shape
    nb = -(-m // block)
    pad = nb * block - m
    if pad:
        values = jnp.pad(values, ((0, pad), (0, 0)))
    xb = values.reshape(nb, block, f)
    within = jnp.cumsum(xb, axis=1)
    block_tot = within[:, -1]
    # Exclusive block prefix via SHIFT, not `cumsum - block_tot`: rows past
    # the live total are unwritten kernel garbage (NaN in interpret mode),
    # and the subtraction form computes NaN - NaN for the very block whose
    # tail holds them, poisoning every in-block prefix. With the shift, a
    # garbage row only affects cumsum positions at/after it — all strictly
    # past every segment boundary (gauss_cum <= total), which is what makes
    # the sentinel-zero-row-free gather in tiled.py safe.
    block_prefix = jnp.concatenate(
        [jnp.zeros((1, f), values.dtype), jnp.cumsum(block_tot, axis=0)[:-1]]
    )
    cs = (within + block_prefix[:, None, :]).reshape(nb * block, f)
    cs0 = jnp.concatenate([jnp.zeros((1, f), values.dtype), cs])
    hi = jnp.minimum(gauss_cum, m)
    # lo[g] == hi[g-1] (exclusive cumsum = inclusive cumsum shifted), so ONE
    # row-gather + a shifted difference replaces two gathers — row gathers
    # are the latency-bound cost here (~8 ns/row), and this halves them.
    # Bit-identical to cs0[hi] - cs0[lo]: the same gathered values are
    # subtracted either way. hi is a non-decreasing clamped cumsum with
    # values in [0, m], so sortedness and boundedness are promised to the
    # gather lowering.
    ch = cs0.at[hi].get(indices_are_sorted=True, mode="promise_in_bounds")
    return ch - jnp.concatenate([jnp.zeros((1, f), values.dtype), ch[:-1]])


def _lane_shift_down(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """x[:, j] <- x[:, j - s] along the last (lane) axis, left fill 0."""
    fill = jnp.zeros(x.shape[:-1] + (s,), x.dtype)
    return jnp.concatenate([fill, x[..., : x.shape[-1] - s]], axis=-1)


def segment_reduce_pre_folded(
    values: jnp.ndarray, gauss_cum: jnp.ndarray, block: int = 2048
) -> jnp.ndarray:
    """`segment_reduce_pre` with the cumsum LANE-FOLDED — MEASURED LOSER,
    kept as the round-4 A/B artifact (do not wire into the hot path without
    new evidence): isolated on-chip A/B at CAP 983k shows reduce-only
    3.42 -> 8.29 ms and the full gather+reduce chain 9.60 -> 14.46 ms
    (`scripts/profile_segreduce.py`; PERF.md round-4 losers) — the
    lane-crossing reshape relayout costs more than the dead-lane waste it
    removes, and the chain is dominated by the row-gather either way.

    A [M, f] array with f = 16 occupies one (8, 128) f32 tile per 8 rows with
    only f of 128 lanes live, so every cumsum pass wastes 128/f of the
    VPU/HBM work. Folding FOLD = 128/f consecutive rows into the lane axis
    ([M/FOLD, 128], fully packed) runs the two-level prefix over FOLD-fold
    fewer sublane rows at full lane width; a log2(FOLD)-step lane-group
    prefix plus one row-shifted correction then rebuilds the exact row-major
    inclusive cumsum:

        full[i, g] = P[i, g] - P[i-1, g] + S[i-1]

    where P is the within-row group prefix of the per-group column cumsum
    and S its all-group total. Garbage tails stay safe: every position a
    garbage row at flat index j can reach has flat index >= j (column
    cumsum moves down rows, the group prefix moves right within a row, the
    S term moves strictly down), all past every segment boundary —
    TestSegmentReduceGarbageTail gates this variant too.

    Float sums re-associate vs the unfolded form (same values, different
    order), so results differ at f32 rounding, not semantics.
    """
    m, f = values.shape
    fold = 128 // f
    if fold <= 1 or m % fold or f & (f - 1) or block % fold:
        return segment_reduce_pre(values, gauss_cum, block)
    mf = m // fold
    xf = values.reshape(mf, fold * f)  # row i = flat rows [fold*i, fold*(i+1))
    blockf = block // fold
    nb = -(-mf // blockf)
    pad = nb * blockf - mf
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    xb = xf.reshape(nb, blockf, fold * f)
    within = jnp.cumsum(xb, axis=1)
    block_tot = within[:, -1]
    block_prefix = jnp.concatenate(
        [jnp.zeros((1, fold * f), values.dtype), jnp.cumsum(block_tot, axis=0)[:-1]]
    )
    cs_col = (within + block_prefix[:, None, :]).reshape(nb * blockf, fold * f)[:mf]
    # Within-row inclusive prefix over the `fold` lane groups (each f wide).
    p = cs_col
    s = f
    while s < fold * f:
        p = p + _lane_shift_down(p, s)
        s *= 2
    # All-group total per row, broadcast back to every group's lanes.
    tot = jnp.tile(p[:, (fold - 1) * f:], (1, fold))
    shift = jnp.concatenate(
        [jnp.zeros((1, fold * f), values.dtype), (tot - p)[:-1]], axis=0
    )
    cs = (p + shift).reshape(m, f)
    cs0 = jnp.concatenate([jnp.zeros((1, f), values.dtype), cs])
    hi = jnp.minimum(gauss_cum, m)
    ch = cs0.at[hi].get(indices_are_sorted=True, mode="promise_in_bounds")
    return ch - jnp.concatenate([jnp.zeros((1, f), values.dtype), ch[:-1]])


# Instance offsets ride in f32 metadata rows (see bin_splats' packed `meta`
# gather); above 2^24 they lose integer exactness and silently corrupt tile
# assignment, so capacity is hard-capped there. 16.7M instances is ~8x the
# steady-state of a 1M-Gaussian 1080p scene; beyond it, shard Gaussians over
# the `gauss` mesh axis (parallel/gauss.py) instead of growing the buffer.
MAX_CAPACITY = 1 << 24


def instance_capacity(max_instances: int, grid: TileGrid) -> int:
    """Static capacity: requested live-instance budget rounded to whole chunks."""
    del grid  # compact layout needs no per-tile alignment headroom
    cap = ((max_instances + INST_CHUNK - 1) // INST_CHUNK) * INST_CHUNK
    if cap > MAX_CAPACITY:
        raise ValueError(
            f"instance capacity {cap} exceeds MAX_CAPACITY {MAX_CAPACITY} "
            "(f32 offset exactness in binning metadata); shard Gaussians over "
            "the `gauss` mesh axis for scenes this dense"
        )
    return cap


def pack_features(splats: Splats) -> jnp.ndarray:
    """[N, 16] feature matrix in Gaussian order (gathered per-instance later)."""
    n = splats.mean2d.shape[0]
    feat = jnp.zeros((n, FEAT_WIDTH), jnp.float32)
    feat = feat.at[:, FEAT_MX:FEAT_MY + 1].set(splats.mean2d)
    feat = feat.at[:, FEAT_CA:FEAT_CC + 1].set(splats.conic)
    feat = feat.at[:, FEAT_R:FEAT_B + 1].set(splats.color)
    feat = feat.at[:, FEAT_OPA].set(splats.opacity)
    return feat


def sort_key_bits(grid: TileGrid) -> int:
    """Bits of the packed (tile | depth) sort key used for depth ordering.

    The CUDA reference radix-sorts a 64-bit (tileID << 32 | float-bits) key; a
    single 32-bit key sorts ~an order of magnitude faster on TPU, so we keep
    the full tile id and give the remaining (32 - tile_bits) bits to depth.

    Depth quantization is RANGE-ADAPTIVE (see `bin_splats`): the frame's
    minimum depth bit-pattern is subtracted and the residual is right-shifted
    only as much as the frame's actual depth RANGE requires. The positive-f32
    bit pattern is monotone and piecewise-log, so the residual spans
    ~(octaves-of-depth-range x 2^23); with 21 depth bits at 1080p the shift is
    0 whenever the scene spans < 2^-2 octaves of depth and at most 6 for a
    0.01..100 frustum — i.e. ordering is EXACT (full f32) for typical scenes
    and never coarser than 2^-17 relative, vs the fixed 2^-12 of a plain
    truncated-float key. Quantified in tests/test_depth_key.py.
    """
    tile_bits = max(int(grid.num_tiles + 1).bit_length(), 1)
    return 32 - tile_bits


def bin_splats(
    splats: Splats,
    grid: TileGrid,
    max_instances: int,
    tile_size: int = TILE_SIZE,
    forward_only: bool = False,
) -> Binning:
    """`forward_only=True` builds a render-only Binning: the sort carries no
    `slots` payload and the pre-sort permutation (`pre_pos`) is not computed
    — those exist solely for the backward/counting gradient reduction. XLA
    DCEs the second sort on its own when `pre_pos` goes unused, but the
    third payload word of the FIRST sort cannot be DCE'd out of the variadic
    sort op, so the inference path must ask for the slim sort explicitly
    (measured on-chip: see PERF.md round-5 inference binning)."""
    n = splats.mean2d.shape[0]
    cap = instance_capacity(max_instances, grid)
    lo_x, lo_y, hi_x, _hi_y, rect_count = tile_rect(
        splats.mean2d, splats.radius, grid, tile_size,
        conic=splats.conic, opacity=splats.opacity,
    )
    mask, count, use_mask = _exact_tile_mask(
        splats, lo_x, lo_y, hi_x, rect_count, tile_size
    )

    cum = jnp.cumsum(count)
    total = cum[-1]
    offsets = cum - count

    # Instance slot -> source Gaussian: scatter each Gaussian's index at its
    # first slot, then forward-fill with a running max. (With ascending ids, a
    # zero-count Gaussian colliding at the same offset loses the max to the
    # owning one, or harmlessly wins when the owner precedes it.)
    slots = jnp.arange(cap, dtype=jnp.int32)
    marks = jnp.full((cap,), -1, jnp.int32)
    marks = marks.at[jnp.where(count > 0, offsets, cap)].max(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    gid = jax.lax.cummax(marks, axis=0)
    live = slots < total
    gid_c = jnp.clip(gid, 0, n - 1)

    # One packed row-gather for all per-Gaussian metadata (every column fits
    # f32 exactly: offsets < 2^24, mask half-words < 2^16; gather rows, not 8
    # scalar gathers — row gathers cost the same regardless of width <= 16).
    # The fallback (rect area > 32 tiles) is encoded as mask == 0: live slots
    # of a masked Gaussian always have popcount(mask) > 0.
    meta = jnp.stack(
        [
            offsets.astype(jnp.float32),
            lo_x.astype(jnp.float32),
            lo_y.astype(jnp.float32),
            jnp.maximum(hi_x - lo_x, 1).astype(jnp.float32),
            splats.depth,
            jnp.where(use_mask, (mask & 0xFFFF).astype(jnp.float32), 0.0),
            jnp.where(use_mask, (mask >> 16).astype(jnp.float32), 0.0),
        ],
        axis=1,
    )  # [N, 7]
    m = meta[gid_c]
    local = slots - m[:, 0].astype(jnp.int32)
    rect_w = m[:, 3].astype(jnp.int32)
    # Map the local slot to its rect tile: the (local+1)-th surviving bit of
    # the exact-intersection mask (or `local` itself on the >32-tile fallback).
    g_mask = m[:, 5].astype(jnp.uint32) | (m[:, 6].astype(jnp.uint32) << 16)
    local = jnp.where(g_mask > 0, _kth_set_bit(g_mask, local), local)
    dx = local % rect_w
    dy = local // rect_w
    tile = (m[:, 2].astype(jnp.int32) + dy) * grid.tiles_x + (m[:, 1].astype(jnp.int32) + dx)
    tile = jnp.where(live, tile, grid.num_tiles)

    # Pack (tile, depth) into one u32 key: fast single-key sort. Dead slots get
    # the maximal key, so they sort strictly after every live instance.
    # Range-adaptive depth quantization (docstring of `sort_key_bits`):
    # subtract the frame-min depth bit-pattern and shift by just enough for
    # the frame's actual range — exact f32 ordering for typical depth ranges,
    # never coarser than ~2^-17 relative. Two u32 reductions, ~free.
    depth_bits = sort_key_bits(grid)
    dep_raw = jax.lax.bitcast_convert_type(m[:, 4], jnp.uint32)
    base = jnp.min(jnp.where(live, dep_raw, jnp.uint32(0xFFFFFFFF)))
    rel = dep_raw - base
    max_rel = jnp.max(jnp.where(live, rel, jnp.uint32(0)))
    bits_needed = 32 - jax.lax.clz(max_rel).astype(jnp.int32)  # 0: depths equal
    shift = jnp.maximum(bits_needed - depth_bits, 0).astype(jnp.uint32)
    dep_u = jnp.where(live, rel >> shift, jnp.uint32((1 << depth_bits) - 1))
    key = (tile.astype(jnp.uint32) << depth_bits) | dep_u
    gid_tagged = jnp.where(live, gid_c, n).astype(jnp.int32)

    if forward_only:
        key_s, gid_s = jax.lax.sort((key, gid_tagged), num_keys=1)
        pre_pos = None
    else:
        key_s, gid_s, inv_s = jax.lax.sort((key, gid_tagged, slots), num_keys=1)
    tile_s = (key_s >> depth_bits).astype(jnp.int32)

    # Raw per-tile ranges in the sorted order (adjacent ranges share
    # 128-instance chunks; the kernels mask boundary rows in-kernel).
    tile_starts = jnp.searchsorted(
        tile_s, jnp.arange(grid.num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    if not forward_only:
        # Pre-sort slot -> sorted position. A second (cheap, ~1 payload) sort
        # by the inverse permutation replaces an unsorted scatter, which XLA
        # executes at ~6 ns/element (~2x the cost of this sort for 1-wide
        # rows, ~16x for the backward's 16-wide rows). Dead slots (i >= total)
        # map to dead sorted positions (>= total) whose kernel-output rows are
        # unwritten garbage — harmless by construction: consumers cumsum in
        # pre-sort order and only read boundary differences at
        # gauss_cum <= total, all BEFORE any dead row's position (see tiled.py
        # blend_bwd) — so no sentinel/zero-row indirection is needed.
        _, pre_pos = jax.lax.sort((inv_s, slots), num_keys=1)

    # Features land in sorted order with ONE row-gather (sentinel id == n hits
    # an appended all-zero row, making padding instances inert).
    feat = jnp.concatenate(
        [pack_features(splats), jnp.zeros((1, FEAT_WIDTH), jnp.float32)]
    )
    flat = feat[gid_s]
    inst_chunks = flat.reshape(cap // INST_CHUNK, INST_CHUNK, FEAT_WIDTH).transpose(0, 2, 1)

    return Binning(
        inst_chunks=inst_chunks,
        pre_pos=pre_pos,
        gauss_cum=cum.astype(jnp.int32),
        tile_starts=tile_starts,
        total=total,
        gid_sorted=gid_s,
    )


def rebind_features(splats: Splats, b: Binning) -> Binning:
    """Refresh a cached Binning's instance FEATURES from new splats, keeping
    the cached (tile | depth) order and tile ranges — the temporal-reuse path
    for trajectory rendering, where frame-to-frame camera deltas are tiny and
    the sort/rect/searchsorted work (~60% of binning) can be amortized over
    several frames (PERF.md round-2). Gaussians culled in the NEW frame but
    present in the cached order are made inert (features zeroed -> alpha 0).
    Forward-only: pre_pos/gauss_cum keep their stale (order-consistent)
    values and must not be used for gradients against the new splats."""
    if splats.mean2d.shape[0] != b.gauss_cum.shape[0]:
        raise ValueError(
            f"cached binning was built for {b.gauss_cum.shape[0]} Gaussians, "
            f"got {splats.mean2d.shape[0]} — JAX gathers clamp out-of-bounds "
            "indices silently, so this would mis-render instead of failing"
        )
    visible = (splats.radius > 0)[:, None]
    feat = jnp.where(visible, pack_features(splats), 0.0)
    # Non-finite screen coords from behind-camera Gaussians are zeroed above,
    # but guard the gather row too (sentinel id == n hits the zero row).
    feat = jnp.concatenate([feat, jnp.zeros((1, FEAT_WIDTH), jnp.float32)])
    flat = feat[b.gid_sorted]
    cap = b.gid_sorted.shape[0]
    inst_chunks = flat.reshape(cap // INST_CHUNK, INST_CHUNK, FEAT_WIDTH).transpose(0, 2, 1)
    return dataclasses.replace(b, inst_chunks=inst_chunks)


def snug_capacity(
    live: int,
    headroom: float = 1.4,
    quantum_small: int = 8192,
    floor: int = 1 << 14,
) -> int:
    """Right-sized instance capacity for a measured live count: `headroom`
    over the live instances, rounded to a compile-cache-friendly quantum
    (64k above 500k live — the training loop, trajectory renderer, and
    benches all share this policy so they measure the same buffers)."""
    cap = max(int(live * headroom), floor)
    quantum = 65536 if cap > 500_000 else quantum_small
    return ((cap + quantum - 1) // quantum) * quantum


def estimate_max_instances(num_gaussians: int, grid: TileGrid, avg_tiles_per_gaussian: float = 8.0) -> int:
    """Static instance-buffer capacity heuristic; the training driver grows it
    (with a recompile) if `Binning.total` ever approaches it."""
    m = int(num_gaussians * avg_tiles_per_gaussian)
    m = min(max(m, 1 << 16), MAX_CAPACITY)
    return ((m + INST_CHUNK - 1) // INST_CHUNK) * INST_CHUNK
