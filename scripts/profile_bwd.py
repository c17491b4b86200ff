"""Backward-piece timing of the 1080p train step with real cotangents."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from lightgaussian_tpu.ops import losses
from lightgaussian_tpu.ops.rasterize import pallas_blend as pk
from lightgaussian_tpu.ops.rasterize import binning as binning_mod
from lightgaussian_tpu.ops.rasterize.binning import make_grid
from lightgaussian_tpu.ops.rasterize.projection import preprocess
from lightgaussian_tpu.ops.rasterize.tiled import _assemble_image, _tile_image, _unchunk
from lightgaussian_tpu.utils.synthetic import default_camera, random_scene

WIDTH, HEIGHT = 1920, 1080
N_GAUSS = 300_000
CAP = 1_114_112


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
    target = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)

    splats = jax.jit(lambda: preprocess(scene, camera))()
    b = jax.jit(lambda s: binning_mod.bin_splats(s, grid, CAP))(splats)
    jax.block_until_ready(b)
    print(f"live instances: {int(b.total)} / cap {b.inst_chunks.shape[0]*128}")

    tile_rgb, tile_t = pk.blend_forward(b.tile_starts, b.inst_chunks, grid, False)
    img_pad = _assemble_image(tile_rgb, grid)
    t_pad = _assemble_image(tile_t, grid)[0]
    image = img_pad[:, :HEIGHT, :WIDTH]
    jax.block_until_ready(image)

    timeit("blend_forward kernel", lambda: pk.blend_forward(b.tile_starts, b.inst_chunks, grid, False))

    g_image = jax.jit(jax.grad(lambda im: losses.gs_loss(im, target)))(image)
    jax.block_until_ready(g_image)

    @jax.jit
    def seed(g_image):
        r = (image * g_image).sum(axis=0)
        g_pad = jnp.zeros((3, grid.tiles_y * 32, grid.tiles_x * 32))
        g_pad = g_pad.at[:, :HEIGHT, :WIDTH].set(g_image)
        r_pad = jnp.zeros((1, grid.tiles_y * 32, grid.tiles_x * 32))
        r_pad = r_pad.at[0, :HEIGHT, :WIDTH].set(r)
        return _tile_image(g_pad, grid), _tile_image(r_pad, grid)

    tile_g, tile_r = timeit("bwd seed (r + tile_image)", seed, g_image)

    gc = timeit("blend_backward kernel (real grads)",
                lambda: pk.blend_backward(b.tile_starts, b.inst_chunks, tile_g, tile_r, grid, False))

    @jax.jit
    def reduce_grads(grad_chunks):
        inst_grads = _unchunk(grad_chunks)
        pre = inst_grads[b.pre_pos]
        return binning_mod.segment_reduce_pre(pre, b.gauss_cum)

    timeit("unchunk+gather+segment_reduce (no concat)", reduce_grads, gc)

    @jax.jit
    def reduce_grads_barrier(grad_chunks):
        # concat removal lets XLA fuse the transpose into the gather (the
        # catastrophic chunk-major-gather pattern); the barrier forces the
        # materialization the concat used to provide, without the copy.
        inst_grads = jax.lax.optimization_barrier(_unchunk(grad_chunks))
        pre = inst_grads[b.pre_pos]
        return binning_mod.segment_reduce_pre(pre, b.gauss_cum)

    timeit("  same, with optimization_barrier", reduce_grads_barrier, gc)

    @jax.jit
    def reduce_grads_concat(grad_chunks):
        inst_grads = _unchunk(grad_chunks)
        inst_grads = jnp.concatenate(
            [inst_grads, jnp.zeros((1, inst_grads.shape[1]), inst_grads.dtype)])
        pre = inst_grads[jnp.minimum(b.pre_pos, inst_grads.shape[0] - 1)]
        return binning_mod.segment_reduce_pre(pre, b.gauss_cum)

    timeit("  same, with sentinel concat (round-2 form)", reduce_grads_concat, gc)

    @jax.jit
    def unchunk_only(grad_chunks):
        return _unchunk(grad_chunks)

    timeit("  unchunk transpose only", unchunk_only, gc)

    for k in (8, 16, 32):
        timeit(f"  pallas unchunk_transpose k={k}",
               lambda g, _k=k: pk.unchunk_transpose(g, chunks_per_block=_k), gc)

    @jax.jit
    def gather_only(grad_chunks):
        return _unchunk(grad_chunks)[b.pre_pos]

    timeit("  unchunk+gather only", gather_only, gc)

    # preprocess VJP
    params = scene.params()
    def pre_fn(p):
        return preprocess(scene.with_params(p), camera)
    _, vjp_fn = jax.vjp(pre_fn, params)
    d_splats = jax.tree.map(jnp.zeros_like, splats)
    vjp = jax.jit(lambda d: vjp_fn(d))
    timeit("preprocess VJP", vjp, d_splats)


if __name__ == "__main__":
    main()
