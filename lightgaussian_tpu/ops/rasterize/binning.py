"""Tile binning: duplicate splats into a fixed-capacity, (tile, depth)-sorted
instance buffer — the static-shape XLA replacement for the CUDA rasterizer's
duplicateWithKeys + radix sort (SURVEY.md §2.1a "internal algorithm").

Dynamic per-Gaussian duplication becomes: exclusive-cumsum of per-Gaussian tile
counts + a `searchsorted` from instance slot -> source Gaussian. Slots past the
live total get a sentinel tile id that sorts to the end and never lands in any
tile's range. Sorting uses `jax.lax.sort` with (tile, depth) as a two-key sort.
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


def tile_rect(mean2d: jnp.ndarray, radius: jnp.ndarray, grid: TileGrid, tile_size: int = TILE_SIZE):
    """Clamped [lo, hi) tile rectangle per Gaussian (CUDA `getRect` semantics).

    Returns lo_x, lo_y, hi_x, hi_y (int32) and count (0 where radius <= 0).
    """
    r = radius.astype(jnp.float32)
    lo_x = jnp.clip(jnp.floor((mean2d[:, 0] - r) / tile_size), 0, grid.tiles_x).astype(jnp.int32)
    hi_x = jnp.clip(jnp.floor((mean2d[:, 0] + r) / tile_size) + 1, 0, grid.tiles_x).astype(jnp.int32)
    lo_y = jnp.clip(jnp.floor((mean2d[:, 1] - r) / tile_size), 0, grid.tiles_y).astype(jnp.int32)
    hi_y = jnp.clip(jnp.floor((mean2d[:, 1] + r) / tile_size) + 1, 0, grid.tiles_y).astype(jnp.int32)
    count = jnp.where(
        radius > 0,
        jnp.maximum(hi_x - lo_x, 0) * jnp.maximum(hi_y - lo_y, 0),
        0,
    )
    return lo_x, lo_y, hi_x, hi_y, count


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Binning:
    """Sorted, per-tile-padded instance buffer + per-tile ranges.

    Each tile's instance range is padded to a multiple of INST_CHUNK so every
    128-instance chunk belongs to exactly one tile (chunk-granular kernel
    writes never touch another tile's data). Padding slots have zero features
    (alpha == 0) and sentinel gauss id == N.
    """

    inst_chunks: jnp.ndarray  # [CAP/128, FEAT_WIDTH, 128] f32
    inst_gauss: jnp.ndarray  # [CAP] int32 source Gaussian id (N = padding)
    tile_starts: jnp.ndarray  # [T+1] int32, every entry a multiple of 128
    total: jnp.ndarray  # scalar int32: true live instances (overflow monitor)


def instance_capacity(max_instances: int, grid: TileGrid) -> int:
    """Static padded capacity: live instances + per-tile alignment waste."""
    cap = max_instances + (grid.num_tiles + 1) * INST_CHUNK
    return ((cap + INST_CHUNK - 1) // INST_CHUNK) * INST_CHUNK


def pack_features(splats: Splats) -> jnp.ndarray:
    """[N, 16] feature matrix in Gaussian order (gathered per-instance later)."""
    n = splats.mean2d.shape[0]
    feat = jnp.zeros((n, FEAT_WIDTH), jnp.float32)
    feat = feat.at[:, FEAT_MX:FEAT_MY + 1].set(splats.mean2d)
    feat = feat.at[:, FEAT_CA:FEAT_CC + 1].set(splats.conic)
    feat = feat.at[:, FEAT_R:FEAT_B + 1].set(splats.color)
    feat = feat.at[:, FEAT_OPA].set(splats.opacity)
    return feat


def bin_splats(splats: Splats, grid: TileGrid, max_instances: int, tile_size: int = TILE_SIZE) -> Binning:
    n = splats.mean2d.shape[0]
    cap = instance_capacity(max_instances, grid)
    lo_x, lo_y, hi_x, _hi_y, count = tile_rect(splats.mean2d, splats.radius, grid, tile_size)

    cum = jnp.cumsum(count)
    total = cum[-1]

    # Instance slot -> source Gaussian via searchsorted on the inclusive cumsum.
    slots = jnp.arange(max_instances, dtype=jnp.int32)
    gid = jnp.searchsorted(cum, slots, side="right").astype(jnp.int32)
    live = slots < total
    gid_c = jnp.minimum(gid, n - 1)

    local = slots - (cum[gid_c] - count[gid_c])
    rect_w = jnp.maximum(hi_x[gid_c] - lo_x[gid_c], 1)
    dx = local % rect_w
    dy = local // rect_w
    tile = (lo_y[gid_c] + dy) * grid.tiles_x + (lo_x[gid_c] + dx)
    tile = jnp.where(live, tile, grid.num_tiles).astype(jnp.int32)
    depth = jnp.where(live, splats.depth[gid_c], jnp.inf).astype(jnp.float32)

    tile_s, _depth_s, gid_s = jax.lax.sort(
        (tile, depth, jnp.where(live, gid_c, n).astype(jnp.int32)), num_keys=2
    )

    # True per-tile ranges in the sorted order, then chunk-aligned ranges.
    raw_starts = jnp.searchsorted(
        tile_s, jnp.arange(grid.num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    counts_t = raw_starts[1:] - raw_starts[:-1]
    padded_counts = ((counts_t + INST_CHUNK - 1) // INST_CHUNK) * INST_CHUNK
    tile_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_counts).astype(jnp.int32)]
    )

    # Scatter sorted instances to their padded positions (drop on overflow).
    tile_sc = jnp.minimum(tile_s, grid.num_tiles - 1)
    pos = tile_starts[tile_sc] + (slots - raw_starts[tile_sc])
    pos = jnp.where(live & (tile_s < grid.num_tiles), pos, cap)

    feat = pack_features(splats)
    inst_feat = feat[jnp.minimum(gid_s, n - 1)]
    inst_feat = jnp.where((gid_s < n)[:, None], inst_feat, 0.0)
    flat = jnp.zeros((cap, FEAT_WIDTH), jnp.float32).at[pos].set(inst_feat, mode="drop")
    inst_gauss = jnp.full((cap,), n, jnp.int32).at[pos].set(gid_s, mode="drop")

    inst_chunks = flat.reshape(cap // INST_CHUNK, INST_CHUNK, FEAT_WIDTH).transpose(0, 2, 1)

    return Binning(
        inst_chunks=inst_chunks,
        inst_gauss=inst_gauss,
        tile_starts=tile_starts,
        total=total,
    )


def estimate_max_instances(num_gaussians: int, grid: TileGrid, avg_tiles_per_gaussian: float = 8.0) -> int:
    """Static instance-buffer capacity heuristic; the training driver grows it
    (with a recompile) if `Binning.total` ever approaches it."""
    m = int(num_gaussians * avg_tiles_per_gaussian)
    m = max(m, 1 << 16)
    return ((m + INST_CHUNK - 1) // INST_CHUNK) * INST_CHUNK
