"""Benchmark: fwd+bwd rendering throughput at 1080p on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: pixels/s/chip for a full differentiable render step (forward render of
a 1920x1080 view of a ~300k-Gaussian synthetic scene + L1/D-SSIM loss + backward
to all Gaussian parameters) — the hot loop of 3D-GS training (BASELINE.json).

vs_baseline divides by 15e6 pixels/s: the reference CUDA pipeline trains
MipNeRF360-scale scenes at roughly 15-20 it/s on ~1MP images on an RTX3090/A100
class GPU (30k iters in ~25-30 min), i.e. ~15M pixels/s fwd+bwd.
"""
import json
import sys
import time

import jax

# The remote-compile service takes ~10 min cold for the 1080p step; a
# persistent cache makes reruns (and the driver's bench invocation) fast.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from lightgaussian_tpu.models.gaussians import GaussianScene
from lightgaussian_tpu.ops import losses
from lightgaussian_tpu.ops.rasterize import render
from lightgaussian_tpu.utils.synthetic import default_camera, random_scene

BASELINE_PIX_PER_S = 15e6

WIDTH, HEIGHT = 1920, 1080
N_GAUSS = 300_000
# Steady-state instance capacity: the training loop auto-sizes the buffer to
# 1.4x the live instance count rounded up to a 64k quantum (this scene bins
# 768,651 instances with the tight alpha-support rects + exact ellipse-tile
# intersection masks); every per-instance binning cost scales with capacity,
# so bench uses the capacity real training settles at.
MAX_INSTANCES = 1_114_112
WARMUP, ITERS = 3, 10


def main():
    scene = random_scene(
        n=N_GAUSS, seed=0, extent=2.0, scale_range=(0.004, 0.02), active_sh_degree=3
    )
    camera = default_camera(width=WIDTH, height=HEIGHT, dist=5.0)
    bg = jnp.zeros((3,), jnp.float32)
    target = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)

    def loss_fn(params):
        s = scene.with_params(params)
        out = render(s, camera, bg, max_instances=MAX_INSTANCES)
        return losses.gs_loss(out.render, target), out.num_instances

    step = jax.jit(jax.grad(loss_fn, has_aux=True))

    params = scene.params()
    t0 = time.time()
    grads, total = step(params)
    jax.block_until_ready(grads)
    print(
        f"compile+first step: {time.time()-t0:.1f}s, instances={int(total)}"
        f" (capacity {MAX_INSTANCES})",
        file=sys.stderr,
    )

    for _ in range(WARMUP):
        grads, _ = step(params)
    jax.block_until_ready(grads)

    t0 = time.time()
    for _ in range(ITERS):
        grads, _ = step(params)
    jax.block_until_ready(grads)
    dt = (time.time() - t0) / ITERS

    pix_per_s = WIDTH * HEIGHT / dt
    print(f"step time: {dt*1e3:.1f} ms", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "pixels_per_sec_per_chip_fwd_bwd_1080p",
                "value": round(pix_per_s),
                "unit": "pixels/s",
                "vs_baseline": round(pix_per_s / BASELINE_PIX_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
