"""Forward-only rendering FPS benchmark (PERF.md "Forward-only rendering").

Measures ms/frame over a 600-frame-orbit camera schedule at trajectory step
size, comparing:
  A. fresh binning per frame at the default capacity heuristic (round-1 path)
  B. fresh binning per frame at snug (right-sized) capacity
  C. cached binning (rebin every 8 frames) at snug capacity  <- render_video's
     actual path in round 2
and reports the cached-vs-fresh image PSNR so the speedup's quality cost is
quantified on-chip, not just in interpret-mode tests.

Usage: python scripts/bench_render_fps.py [--n ...] [--width ...] [--height ...]
"""
import argparse
import math
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from lightgaussian_tpu.models.camera import Camera
from lightgaussian_tpu.ops import losses
from lightgaussian_tpu.ops.rasterize import build_binning, default_max_instances, render
from lightgaussian_tpu.utils.synthetic import random_scene

p = argparse.ArgumentParser()
p.add_argument("--n", type=int, default=300_000)
p.add_argument("--width", type=int, default=1920)
p.add_argument("--height", type=int, default=1080)
p.add_argument("--frames", type=int, default=48)
p.add_argument("--rebin_every", type=int, default=8)
args = p.parse_args()

BG = jnp.zeros((3,), jnp.float32)
STEP = 2 * math.pi / 600  # standard 600-frame orbit step


def orbit_cam(t):
    return Camera.look_at(
        eye=[5.0 * math.sin(t), 0.6, -5.0 * math.cos(t)], target=[0, 0, 0],
        width=args.width, height=args.height, fovx=0.9,
    )


def bench(fn, frames, warmup=4):
    for c in frames[:warmup]:
        out = fn(c)
    jax.block_until_ready(out)
    t0 = time.time()
    for c in frames:
        out = fn(c)
    jax.block_until_ready(out)
    return (time.time() - t0) / len(frames) * 1e3


def main():
    scene = random_scene(
        n=args.n, seed=0, extent=2.0, scale_range=(0.004, 0.02), active_sh_degree=3
    )
    cams = [orbit_cam(0.2 + i * STEP) for i in range(args.frames)]

    cap_default = default_max_instances(scene, cams[0])

    def make_fresh(cap):
        return jax.jit(lambda c: render(scene, c, BG, max_instances=cap).render)

    fresh_default = make_fresh(cap_default)
    img0 = fresh_default(cams[0])
    from lightgaussian_tpu.ops.rasterize.binning import snug_capacity

    total = int(render(scene, cams[0], BG, max_instances=cap_default).num_instances)
    cap_snug = snug_capacity(total, headroom=1.35)
    print(f"live instances {total}; default cap {cap_default}, snug {cap_snug}",
          file=sys.stderr)

    fresh_snug = make_fresh(cap_snug)
    bin_fn = jax.jit(lambda c: build_binning(scene, c, max_instances=cap_snug))
    cached_fn = jax.jit(
        lambda c, b: render(scene, c, BG, cached_binning=b).render)

    ms_a = bench(fresh_default, cams)
    ms_b = bench(fresh_snug, cams)

    # C: cached path with the real rebin schedule
    binning = bin_fn(cams[0])
    for c in cams[:4]:
        out = cached_fn(c, binning)
    jax.block_until_ready(out)
    t0 = time.time()
    for i, c in enumerate(cams):
        if i % args.rebin_every == 0:
            binning = bin_fn(c)
        out = cached_fn(c, binning)
    jax.block_until_ready(out)
    ms_c = (time.time() - t0) / len(cams) * 1e3

    # quality: worst cached-vs-fresh PSNR across one rebin window
    binning = bin_fn(cams[0])
    worst = 100.0
    for c in cams[1:args.rebin_every]:
        a = jnp.clip(cached_fn(c, binning), 0, 1)
        b = jnp.clip(fresh_snug(c), 0, 1)
        worst = min(worst, float(losses.psnr(a, b)))

    print(f"A fresh @default cap : {ms_a:7.2f} ms/frame = {1e3 / ms_a:6.1f} FPS")
    print(f"B fresh @snug cap    : {ms_b:7.2f} ms/frame = {1e3 / ms_b:6.1f} FPS")
    print(f"C cached (rebin {args.rebin_every:2d})  : {ms_c:7.2f} ms/frame = "
          f"{1e3 / ms_c:6.1f} FPS")
    print(f"speedup C/A: {ms_a / ms_c:.2f}x ; cached-vs-fresh worst PSNR over "
          f"{args.rebin_every - 1} reused frames: {worst:.1f} dB")


if __name__ == "__main__":
    main()
