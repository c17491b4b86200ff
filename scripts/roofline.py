"""Speed-of-light / MFU accounting for the blend kernels + reduce path.

Measures, on the real chip:
  1. the VPU's achievable per-pass cost on the kernels' working shape
     ([128, 1024] f32): dependent FMA chains, the scan step's
     concat-shift+multiply, and sublane/lane reductions;
  2. HBM streaming bandwidth and the row-gather's per-row cost (the reduce
     path's floor);
  3. the fwd/bwd blend kernels and every step piece at bench shapes.

The PERF.md "Roofline" section does the arithmetic: algorithmic pass counts
per 128-instance chunk x measured per-pass cost x chunks/step = the kernels'
floor; bytes moved / measured bandwidth (+ rows gathered x measured row cost)
= the plumbing's floor. Run: python scripts/roofline.py
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lightgaussian_tpu.ops import losses
from lightgaussian_tpu.ops.rasterize import binning as binning_mod
from lightgaussian_tpu.ops.rasterize import pallas_blend as pk
from lightgaussian_tpu.ops.rasterize.binning import make_grid
from lightgaussian_tpu.ops.rasterize.projection import preprocess
from lightgaussian_tpu.ops.rasterize.tiled import _assemble_image, _tile_image, _unchunk
from lightgaussian_tpu.utils.synthetic import default_camera, random_scene

WIDTH, HEIGHT = 1920, 1080
N_GAUSS = 300_000
CAP = 983_040  # bench.py's steady-state capacity

G, PIX = 128, 1024  # the kernels' working shape


def timeit(name, fn, *args, iters=20, unit="ms", scale=1.0):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt*1e3:9.3f} ms" +
          (f"  ({dt*scale:.3g} {unit})" if unit != "ms" else ""))
    return dt


# ---------------------------------------------------------------- VPU micro
def _chain_kernel(x_ref, o_ref, *, passes, op):
    x = x_ref[...]
    for i in range(passes):
        if op == "fma":
            x = x * 0.9999999 + 1e-12
        elif op == "mul":
            x = x * 0.9999999
        elif op == "scan_mul":
            # one full Hillis-Steele prefix product (7 concat-shift+mul steps)
            x = pk._inclusive_scan_mul(x)
        elif op == "scan_add":
            x = pk._inclusive_scan_add(x * 1e-30)  # keep finite
        elif op == "lane_reduce":
            # 6 lane reductions + broadcast-mul back (the bwd moment pattern)
            r = jnp.sum(x, axis=1, keepdims=True)
            x = x * 0.9999999 + r * 1e-20
        elif op == "sublane_reduce":
            r = jnp.min(jnp.where(x > 0, x, 1.0), axis=0, keepdims=True)
            x = x * 0.9999999 + r * 1e-20
        elif op == "exp":
            x = jnp.exp(x * 1e-6) * 1e-6
    o_ref[...] = x


def vpu_chain(n_blocks, passes, op):
    kernel = functools.partial(_chain_kernel, passes=passes, op=op)
    x = jnp.full((n_blocks, G, PIX), 0.5, jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((1, G, PIX), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, G, PIX), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_blocks, G, PIX), jnp.float32),
    )(x)


def measure_vpu():
    print("\n== VPU per-pass cost on [128,1024] f32 (dependent chains) ==")
    nb = 64
    results = {}
    for op, (p_lo, p_hi) in {
        "mul": (32, 96), "fma": (32, 96), "exp": (8, 24),
        "scan_mul": (4, 12), "scan_add": (4, 12),
        "lane_reduce": (8, 24), "sublane_reduce": (8, 24),
    }.items():
        f_lo = jax.jit(lambda _op=op, _p=p_lo: vpu_chain(nb, _p, _op))
        f_hi = jax.jit(lambda _op=op, _p=p_hi: vpu_chain(nb, _p, _op))
        t_lo = timeit(f"  chain {op} x{p_lo}", f_lo, iters=30)
        t_hi = timeit(f"  chain {op} x{p_hi}", f_hi, iters=30)
        per = (t_hi - t_lo) / (p_hi - p_lo) / nb
        results[op] = per
        ops_per = G * PIX / per if per > 0 else float("inf")
        print(f"    -> {per*1e9:8.1f} ns / {op} step on one [128,1024] block"
              f"  ({ops_per/1e12:.2f} T elem/s)")
    return results


# ---------------------------------------------------------------- HBM micro
def measure_hbm(b):
    print("\n== HBM bandwidth + gather cost (reduce-path floor) ==")
    big = jnp.zeros((CAP // 128, 16, 128), jnp.float32)  # 64 MiB

    copy = jax.jit(lambda x: x + 1.0)
    dt = timeit("  stream 64 MiB read+write (x+1)", copy, big, iters=30)
    print(f"    -> {2*big.nbytes/dt/1e9:.0f} GB/s streaming")

    tr = jax.jit(lambda x: x.transpose(0, 2, 1).reshape(-1, 16))
    dt = timeit("  unchunk transpose [NC,16,128]->[CAP,16]", tr, big, iters=30)
    print(f"    -> {2*big.nbytes/dt/1e9:.0f} GB/s effective")

    flat = jnp.zeros((CAP + 1, 16), jnp.float32)
    idx = b.pre_pos
    gather = jax.jit(lambda x, i: x[i])
    dt = timeit("  row-gather [CAP,16] via pre_pos", gather, flat, idx, iters=30)
    print(f"    -> {dt/CAP*1e9:.2f} ns/row ({2*flat.nbytes/dt/1e9:.0f} GB/s)")

    # same gather but with SORTED (contiguous-ish) indices: isolates the
    # randomness cost from the per-row cost
    idx_sorted = jnp.sort(idx)
    dt = timeit("  row-gather, sorted indices", gather, flat, idx_sorted, iters=30)
    print(f"    -> {dt/CAP*1e9:.2f} ns/row")

    seq = jnp.arange(CAP + 1, dtype=jnp.int32)[:-1]
    dt = timeit("  row-gather, identity indices", gather, flat, seq, iters=30)
    print(f"    -> {dt/CAP*1e9:.2f} ns/row")


# ------------------------------------------------------------- step pieces
def main():
    dev = jax.devices()[0]
    print(f"roofline on {dev.platform} ({dev.device_kind})")

    scene = random_scene(n=N_GAUSS, seed=0, extent=2.0, scale_range=(0.004, 0.02),
                         active_sh_degree=3)
    camera = default_camera(width=WIDTH, height=HEIGHT, dist=5.0)
    grid = make_grid(WIDTH, HEIGHT)
    target = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)

    splats = jax.jit(lambda: preprocess(scene, camera))()
    bin_f = jax.jit(lambda s: binning_mod.bin_splats(s, grid, CAP))
    b = bin_f(splats)
    jax.block_until_ready(b)
    total = int(b.total)
    starts = np.asarray(b.tile_starts).astype(np.int64)
    spans = np.maximum(starts[1:] - starts[:-1], 0)
    kchunks = np.where(
        spans > 0,
        (starts[1:] + 127) // 128 - starts[:-1] // 128,
        0,
    )
    print(f"live instances {total} / cap {CAP}; tiles {grid.num_tiles}; "
          f"chunk-iterations (incl. boundary re-reads) {int(kchunks.sum())} "
          f"vs ceil(total/128) = {-(-total // 128)}")

    vpu = measure_vpu()
    measure_hbm(b)

    print("\n== step pieces at bench shapes (CAP snug 983k) ==")
    timeit("preprocess", jax.jit(lambda: preprocess(scene, camera)))
    timeit("binning", bin_f, splats)
    timeit("blend_forward kernel",
           lambda: pk.blend_forward(b.tile_starts, b.inst_chunks, grid, False))

    tile_rgb, tile_t = pk.blend_forward(b.tile_starts, b.inst_chunks, grid, False)
    img_pad = _assemble_image(tile_rgb, grid)
    image = img_pad[:, :HEIGHT, :WIDTH]
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

    tile_g, tile_r = seed(g_image)
    jax.block_until_ready((tile_g, tile_r))
    timeit("bwd seed (r + tile_image)", seed, g_image)

    gc = pk.blend_backward(b.tile_starts, b.inst_chunks, tile_g, tile_r, grid, False)
    jax.block_until_ready(gc)
    timeit("blend_backward kernel",
           lambda: pk.blend_backward(b.tile_starts, b.inst_chunks, tile_g, tile_r, grid, False))

    @jax.jit
    def reduce_grads(grad_chunks):
        inst_grads = _unchunk(grad_chunks)
        inst_grads = jnp.concatenate(
            [inst_grads, jnp.zeros((1, inst_grads.shape[1]), inst_grads.dtype)])
        pre = inst_grads[b.pre_pos]
        return binning_mod.segment_reduce_pre(pre, b.gauss_cum)

    timeit("unchunk+concat+gather+segment_reduce", reduce_grads, gc)


if __name__ == "__main__":
    main()
