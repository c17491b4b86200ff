"""Piece-wise timing of bin_splats internals on the real chip."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from lightgaussian_tpu.ops.rasterize import binning as B
from lightgaussian_tpu.ops.rasterize.binning import make_grid
from lightgaussian_tpu.ops.rasterize.projection import preprocess
from lightgaussian_tpu.utils.synthetic import default_camera, random_scene

WIDTH, HEIGHT = 1920, 1080
N_GAUSS = 300_000
CAP = 1_114_112


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:46s} {dt:8.3f} ms")
    return out


def main():
    scene = random_scene(n=N_GAUSS, seed=0, extent=2.0, scale_range=(0.004, 0.02),
                         active_sh_degree=3)
    camera = default_camera(width=WIDTH, height=HEIGHT, dist=5.0)
    grid = make_grid(WIDTH, HEIGHT)

    splats = jax.jit(lambda: preprocess(scene, camera))()
    jax.block_until_ready(splats)

    timeit("bin_splats TOTAL",
           jax.jit(lambda s: B.bin_splats(s, grid, CAP)), splats)

    # ---- pieces ----
    @jax.jit
    def rect_mask(s):
        lo_x, lo_y, hi_x, hi_y, rc = B.tile_rect(
            s.mean2d, s.radius, grid, B.TILE_SIZE, conic=s.conic, opacity=s.opacity)
        return B._exact_tile_mask(s, lo_x, lo_y, hi_x, rc, B.TILE_SIZE)

    timeit("tile_rect + exact mask [N,32]", rect_mask, splats)

    lo_x, lo_y, hi_x, _hi_y, rect_count = jax.jit(lambda s: B.tile_rect(
        s.mean2d, s.radius, grid, B.TILE_SIZE, conic=s.conic, opacity=s.opacity))(splats)
    mask, count, use_mask = jax.jit(lambda s: B._exact_tile_mask(
        s, lo_x, lo_y, hi_x, rect_count, B.TILE_SIZE))(splats)

    n = N_GAUSS

    @jax.jit
    def fill(count):
        cum = jnp.cumsum(count)
        total = cum[-1]
        offsets = cum - count
        slots = jnp.arange(CAP, dtype=jnp.int32)
        marks = jnp.full((CAP,), -1, jnp.int32)
        marks = marks.at[jnp.where(count > 0, offsets, CAP)].max(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        gid = jax.lax.cummax(marks, axis=0)
        return gid, total, offsets

    gid, total, offsets = timeit("cumsum + scatter-marks + cummax [CAP]", fill, count)

    @jax.jit
    def meta_key(s, gid, total, offsets):
        slots = jnp.arange(CAP, dtype=jnp.int32)
        live = slots < total
        gid_c = jnp.clip(gid, 0, n - 1)
        meta = jnp.stack([
            offsets.astype(jnp.float32),
            lo_x.astype(jnp.float32),
            lo_y.astype(jnp.float32),
            jnp.maximum(hi_x - lo_x, 1).astype(jnp.float32),
            s.depth,
            jnp.where(use_mask, (mask & 0xFFFF).astype(jnp.float32), 0.0),
            jnp.where(use_mask, (mask >> 16).astype(jnp.float32), 0.0),
        ], axis=1)
        m = meta[gid_c]
        local = slots - m[:, 0].astype(jnp.int32)
        rect_w = m[:, 3].astype(jnp.int32)
        g_mask = m[:, 5].astype(jnp.uint32) | (m[:, 6].astype(jnp.uint32) << 16)
        local = jnp.where(g_mask > 0, B._kth_set_bit(g_mask, local), local)
        dx = local % rect_w
        dy = local // rect_w
        tile = (m[:, 2].astype(jnp.int32) + dy) * grid.tiles_x + (m[:, 1].astype(jnp.int32) + dx)
        tile = jnp.where(live, tile, grid.num_tiles)
        depth_bits = B.sort_key_bits(grid)
        dep_u = jax.lax.bitcast_convert_type(m[:, 4], jnp.uint32) >> (32 - depth_bits)
        dep_u = jnp.where(live, dep_u, jnp.uint32((1 << depth_bits) - 1))
        key = (tile.astype(jnp.uint32) << depth_bits) | dep_u
        gid_tagged = jnp.where(live, gid_c, n).astype(jnp.int32)
        return key, gid_tagged

    key, gid_tagged = timeit("meta row-gather + key build [CAP]", meta_key,
                             splats, gid, total, offsets)

    slots = jnp.arange(CAP, dtype=jnp.int32)
    timeit("sort1: (key, gid, slots) 1key+2payload",
           jax.jit(lambda k, g: jax.lax.sort((k, g, slots), num_keys=1)), key, gid_tagged)
    timeit("sort1b: (key, gid) 1key+1payload",
           jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1)), key, gid_tagged)

    key_s, gid_s, inv_s = jax.jit(
        lambda k, g: jax.lax.sort((k, g, slots), num_keys=1))(key, gid_tagged)

    timeit("sort2: (inv_s, slots) -> pre_pos",
           jax.jit(lambda i: jax.lax.sort((i, slots), num_keys=1)), inv_s)
    timeit("scatter alt: pre_pos.at[inv_s].set(slots)",
           jax.jit(lambda i: jnp.full((CAP,), CAP, jnp.int32).at[i].set(slots)), inv_s)

    depth_bits = B.sort_key_bits(grid)
    timeit("searchsorted tile_starts",
           jax.jit(lambda ks: jnp.searchsorted(
               (ks >> depth_bits).astype(jnp.int32),
               jnp.arange(grid.num_tiles + 1, dtype=jnp.int32), side="left")), key_s)

    @jax.jit
    def featgather(s, gid_s):
        feat = jnp.concatenate([B.pack_features(s), jnp.zeros((1, B.FEAT_WIDTH), jnp.float32)])
        flat = feat[gid_s]
        return flat.reshape(CAP // 128, 128, B.FEAT_WIDTH).transpose(0, 2, 1)

    timeit("feature row-gather + chunk transpose", featgather, splats, gid_s)


if __name__ == "__main__":
    main()
