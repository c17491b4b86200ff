"""Component-wise timing breakdown of the 1080p train step on the real chip.

Not part of the test suite — a developer tool mirroring bench.py's setup.
Usage: python scripts/profile_step.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from lightgaussian_tpu.ops import losses
from lightgaussian_tpu.ops.rasterize import render
from lightgaussian_tpu.ops.rasterize.binning import bin_splats, make_grid
from lightgaussian_tpu.ops.rasterize.projection import preprocess
from lightgaussian_tpu.ops.rasterize import tiled as tiled_mod
from lightgaussian_tpu.utils.synthetic import default_camera, random_scene

WIDTH, HEIGHT = 1920, 1080
N_GAUSS = 300_000
MAX_INSTANCES = 1_500_000


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {dt:8.2f} ms")
    return out


def main():
    scene = random_scene(
        n=N_GAUSS, seed=0, extent=2.0, scale_range=(0.004, 0.02), active_sh_degree=3
    )
    camera = default_camera(width=WIDTH, height=HEIGHT, dist=5.0)
    bg = jnp.zeros((3,), jnp.float32)
    target = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)
    grid = make_grid(WIDTH, HEIGHT)
    params = scene.params()

    # --- pieces ---
    pre = jax.jit(lambda p: preprocess(scene.with_params(p), camera))
    splats = timeit("preprocess (cull/EWA/SH)", pre, params)

    binf = jax.jit(lambda s: bin_splats(s, grid, MAX_INSTANCES))
    binning = timeit("bin_splats (dup+sort+gather)", binf, splats)

    fwd_blend = jax.jit(
        lambda s: tiled_mod.blend_tiled(s, bg, WIDTH, HEIGHT, MAX_INSTANCES, False)
    )
    timeit("blend_tiled fwd (incl. re-binning)", fwd_blend, splats)

    fwd = jax.jit(lambda p: render(scene.with_params(p), camera, bg,
                                   max_instances=MAX_INSTANCES).render)
    img = timeit("full forward render", fwd, params)

    lossf = jax.jit(lambda im: losses.gs_loss(im, target))
    timeit("loss (L1 + D-SSIM)", lossf, img)

    lgrad = jax.jit(jax.grad(lambda im: losses.gs_loss(im, target)))
    timeit("loss backward (d/dimage)", lgrad, img)

    def loss_fn(p):
        s = scene.with_params(p)
        out = render(s, camera, bg, max_instances=MAX_INSTANCES)
        return losses.gs_loss(out.render, target)

    timeit("forward + loss (fused)", jax.jit(loss_fn), params)
    step = jax.jit(jax.grad(loss_fn))
    timeit("FULL fwd+bwd step", step, params)


if __name__ == "__main__":
    main()
