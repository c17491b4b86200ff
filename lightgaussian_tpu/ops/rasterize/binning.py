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

# Packed per-instance feature columns (width 16 for contiguous 64-byte rows).
FEAT_MX, FEAT_MY = 0, 1
FEAT_CA, FEAT_CB, FEAT_CC = 2, 3, 4
FEAT_R, FEAT_G, FEAT_B = 5, 6, 7
FEAT_OPA = 8
FEAT_WIDTH = 16


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
    """Sorted instance buffer + per-tile ranges."""

    inst_feat: jnp.ndarray  # [M, 16] packed per-instance features, sorted
    inst_gauss: jnp.ndarray  # [M] source Gaussian id (int32), sorted
    tile_starts: jnp.ndarray  # [T+1] int32 range starts into the sorted buffer
    total: jnp.ndarray  # scalar int32: live instances (may exceed M => overflow)


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

    starts = jnp.searchsorted(
        tile_s, jnp.arange(grid.num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    feat = pack_features(splats)
    inst_feat = feat[jnp.minimum(gid_s, n - 1)]
    inst_feat = jnp.where((gid_s < n)[:, None], inst_feat, 0.0)

    return Binning(
        inst_feat=inst_feat,
        inst_gauss=gid_s,
        tile_starts=starts,
        total=total,
    )


def estimate_max_instances(num_gaussians: int, grid: TileGrid, avg_tiles_per_gaussian: float = 8.0) -> int:
    """Static instance-buffer capacity heuristic; the training driver grows it
    (with a recompile) if `Binning.total` ever approaches it."""
    m = int(num_gaussians * avg_tiles_per_gaussian)
    m = max(m, 1 << 16)
    # round to multiple of 4096 for clean chunking
    return ((m + 4095) // 4096) * 4096
