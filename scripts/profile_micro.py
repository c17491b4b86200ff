"""Micro-profile of binning internals and backward pieces on the real chip."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from lightgaussian_tpu.ops.rasterize import pallas_blend as pk
from lightgaussian_tpu.ops.rasterize.binning import (
    FEAT_WIDTH, INST_CHUNK, bin_splats, make_grid, pack_features,
    segment_reduce_pre, tile_rect,
)
from lightgaussian_tpu.ops.rasterize.projection import preprocess
from lightgaussian_tpu.utils.synthetic import default_camera, random_scene

WIDTH, HEIGHT = 1920, 1080
N_GAUSS = 300_000
CAP = (1_500_000 // INST_CHUNK) * INST_CHUNK


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:46s} {dt:8.2f} ms")
    return out


def main():
    scene = random_scene(n=N_GAUSS, seed=0, extent=2.0, scale_range=(0.004, 0.02),
                         active_sh_degree=3)
    camera = default_camera(width=WIDTH, height=HEIGHT, dist=5.0)
    grid = make_grid(WIDTH, HEIGHT)
    splats = jax.jit(lambda: preprocess(scene, camera))()
    jax.block_until_ready(splats)

    b = jax.jit(lambda s: bin_splats(s, grid, CAP))(splats)
    jax.block_until_ready(b)
    print(f"live instances: {int(b.total)} / cap {CAP}")

    n = N_GAUSS
    key = jax.random.PRNGKey(0)
    keys = jax.random.bits(key, (CAP,), jnp.uint32)
    gid = jax.random.randint(key, (CAP,), 0, n, dtype=jnp.int32)
    slots = jnp.arange(CAP, dtype=jnp.int32)

    timeit("sort key+2payloads (1.5M)",
           jax.jit(lambda k, g, s: jax.lax.sort((k, g, s), num_keys=1)), keys, gid, slots)
    timeit("sort key+1payload (1.5M)",
           jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1)), keys, gid)
    timeit("scatter iota (invert perm, 1.5M)",
           jax.jit(lambda i: jnp.zeros((CAP,), jnp.int32).at[i].set(slots)), gid)

    feat = jnp.concatenate([pack_features(splats), jnp.zeros((1, FEAT_WIDTH), jnp.float32)])
    timeit("row-gather [1.5M, 16] from [300k, 16]",
           jax.jit(lambda f, g: f[g]), feat, gid)
    big = jax.random.normal(key, (CAP + 1, FEAT_WIDTH), jnp.float32)
    timeit("row-gather [1.5M, 16] from [1.5M, 16]",
           jax.jit(lambda f, g: f[g]), big, slots)  # sequential gather (best case)
    perm = jax.random.permutation(key, CAP)
    timeit("row-gather [1.5M,16] random perm",
           jax.jit(lambda f, g: f[g]), big, perm)

    timeit("segment_reduce_pre [1.5M,16] -> [300k,16]",
           jax.jit(lambda v, c: segment_reduce_pre(v, c)), big[:-1], b.gauss_cum)

    timeit("chunk transpose [CAP/128,128,16]->[.,16,128]",
           jax.jit(lambda f: f[:CAP].reshape(CAP // 128, 128, FEAT_WIDTH).transpose(0, 2, 1)),
           big)

    timeit("blend_forward kernel only",
           lambda ts, ic: pk.blend_forward(ts, ic, grid, False),
           b.tile_starts, b.inst_chunks)

    tile_g = jnp.ones((grid.num_tiles, 3, 1024), jnp.float32) * 1e-3
    tile_r = jnp.ones((grid.num_tiles, 1, 1024), jnp.float32) * 1e-3
    timeit("blend_backward kernel only",
           lambda ts, ic, g, r: pk.blend_backward(ts, ic, g, r, grid, False),
           b.tile_starts, b.inst_chunks, tile_g, tile_r)

    # full bin_splats again for reference
    timeit("bin_splats total", jax.jit(lambda s: bin_splats(s, grid, CAP)), splats)


if __name__ == "__main__":
    main()
