"""Piece-wise timing of the INFERENCE fresh-frame path on the real chip,
at the FPS bench's eval operating point (120k Gaussians @ 1237x822, deg-2,
snug capacity 1.15x) and optionally the 300k@1080p point (--large).

Round-5 follow-up to PERF.md's "binning is the inference bottleneck": times
each binning piece at inference scale, plus candidate restructurings
(forward-only slim sort, searchsorted gid fill) so the structural attack is
chosen on numbers, not guesses.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from lightgaussian_tpu.models.camera import Camera
from lightgaussian_tpu.ops.rasterize import binning as B
from lightgaussian_tpu.ops.rasterize import pallas_blend as pk
from lightgaussian_tpu.ops.rasterize import tiled as tiled_mod
from lightgaussian_tpu.ops.rasterize.api import default_max_instances
from lightgaussian_tpu.ops.rasterize.binning import make_grid, snug_capacity
from lightgaussian_tpu.ops.rasterize.projection import preprocess
from lightgaussian_tpu.utils.synthetic import random_scene

p = argparse.ArgumentParser()
p.add_argument("--large", action="store_true", help="300k @ 1920x1080 point")
p.add_argument("--iters", type=int, default=30)
args = p.parse_args()

if args.large:
    N_GAUSS, WIDTH, HEIGHT, DEG = 300_000, 1920, 1080, 3
    HEADROOM = 1.35
else:
    N_GAUSS, WIDTH, HEIGHT, DEG = 120_000, 1237, 822, 2
    HEADROOM = 1.15

BG = jnp.zeros((3,), jnp.float32)


def timeit(name, fn, *a, iters=None):
    iters = iters or args.iters
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {dt:8.3f} ms")
    return out


def main():
    scene = random_scene(n=N_GAUSS, seed=0, extent=2.0, scale_range=(0.004, 0.02),
                         active_sh_degree=DEG)
    camera = Camera.look_at(eye=[5.0 * 0.19867, 0.6, -5.0 * 0.98007],
                            target=[0, 0, 0], width=WIDTH, height=HEIGHT, fovx=0.9)
    grid = make_grid(WIDTH, HEIGHT)

    splats = jax.jit(lambda: preprocess(scene, camera))()
    jax.block_until_ready(splats)
    from lightgaussian_tpu.ops.rasterize import render

    total = int(render(scene, camera, BG,
                       max_instances=default_max_instances(scene, camera)).num_instances)
    cap = snug_capacity(total, headroom=HEADROOM)
    print(f"live {total}, snug cap {cap}, grid {grid.tiles_x}x{grid.tiles_y}")

    # ---- end-to-end frames ----
    timeit("FRAME fresh fused (preprocess+bin+fast blend)",
           jax.jit(lambda c: render(scene, c, BG, max_instances=cap, fast=True).render),
           camera)
    timeit("preprocess only", jax.jit(lambda: preprocess(scene, camera)))
    timeit("bin_splats full (train form)",
           jax.jit(lambda s: B.bin_splats(s, grid, cap)), splats)
    bfwd = timeit("bin_splats forward_only",
                  jax.jit(lambda s: B.bin_splats(s, grid, cap, forward_only=True)), splats)
    timeit("fast blend kernel only",
           jax.jit(lambda b: pk.blend_forward_fast(b.tile_starts, b.inst_chunks, grid, False)),
           bfwd)

    # ---- binning pieces at inference scale ----
    @jax.jit
    def rect_mask(s):
        lo_x, lo_y, hi_x, hi_y, rc = B.tile_rect(
            s.mean2d, s.radius, grid, B.TILE_SIZE, conic=s.conic, opacity=s.opacity)
        m, c, u = B._exact_tile_mask(s, lo_x, lo_y, hi_x, rc, B.TILE_SIZE)
        return lo_x, lo_y, hi_x, m, c, u

    lo_x, lo_y, hi_x, mask, count, use_mask = timeit(
        "  tile_rect + exact mask [N,32]", rect_mask, splats)

    n = N_GAUSS

    @jax.jit
    def fill(count):
        cum = jnp.cumsum(count)
        total = cum[-1]
        offsets = cum - count
        slots = jnp.arange(cap, dtype=jnp.int32)
        marks = jnp.full((cap,), -1, jnp.int32)
        marks = marks.at[jnp.where(count > 0, offsets, cap)].max(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        gid = jax.lax.cummax(marks, axis=0)
        return gid, total, offsets

    gid, tot, offsets = timeit("  gid fill: scatter-marks + cummax [CAP]", fill, count)

    @jax.jit
    def fill_ss(count):
        cum = jnp.cumsum(count)
        slots = jnp.arange(cap, dtype=jnp.int32)
        gid = jnp.searchsorted(cum, slots, side="right").astype(jnp.int32)
        return gid, cum[-1], cum - count

    gid2, _, _ = timeit("  gid fill ALT: searchsorted(cum, slots)", fill_ss, count)
    assert bool((jnp.clip(gid, 0, n - 1)[: int(tot)] == gid2[: int(tot)]).all()), \
        "searchsorted fill disagrees"

    @jax.jit
    def meta_key(s, gid, total, offsets):
        slots = jnp.arange(cap, dtype=jnp.int32)
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

    key, gid_tagged = timeit("  meta row-gather + key build [CAP]", meta_key,
                             splats, gid, tot, offsets)

    slots = jnp.arange(cap, dtype=jnp.int32)
    timeit("  sort (key, gid, slots) 1key+2payload",
           jax.jit(lambda k, g: jax.lax.sort((k, g, slots), num_keys=1)), key, gid_tagged)
    key_s, gid_s = timeit("  sort (key, gid) 1key+1payload",
                          jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1)),
                          key, gid_tagged)
    timeit("  sort key only",
           jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)), key)

    depth_bits = B.sort_key_bits(grid)
    timeit("  searchsorted tile_starts",
           jax.jit(lambda ks: jnp.searchsorted(
               (ks >> depth_bits).astype(jnp.int32),
               jnp.arange(grid.num_tiles + 1, dtype=jnp.int32), side="left")), key_s)

    @jax.jit
    def featgather(s, gid_s):
        feat = jnp.concatenate([B.pack_features(s), jnp.zeros((1, B.FEAT_WIDTH), jnp.float32)])
        flat = feat[gid_s]
        return flat.reshape(cap // 128, 128, B.FEAT_WIDTH).transpose(0, 2, 1)

    timeit("  feature row-gather + chunk transpose", featgather, splats, gid_s)

    # cached-reuse rebind for comparison (the temporal path's per-frame cost)
    timeit("rebind_features (cached path per-frame)",
           jax.jit(lambda s, b: B.rebind_features(s, b)), splats, bfwd)


if __name__ == "__main__":
    main()
