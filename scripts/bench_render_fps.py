"""Forward-only rendering FPS benchmark (PERF.md "Forward-only rendering").

Measures ms/frame over a 600-frame-orbit camera schedule at trajectory step
size, comparing:
  A. fresh binning per frame at the default capacity heuristic (round-1 path)
  B. fresh binning per frame at snug (right-sized) capacity
  C. cached binning (rebin every --rebin_every frames) at snug capacity
  D. drift-gated schedule (render_video's round-4 default: rebin when the
     measured splat drift exceeds --drift_px, upper bound --rebin_every)
and reports the cached-vs-fresh worst image PSNR so any speedup's quality
cost is quantified on-chip, not just in interpret-mode tests. All configs
use the render-only fast kernel (the shipped inference path).

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
from lightgaussian_tpu.render.sets import plan_rebin_schedule
from lightgaussian_tpu.utils.synthetic import random_scene

p = argparse.ArgumentParser()
p.add_argument("--n", type=int, default=300_000)
p.add_argument("--width", type=int, default=1920)
p.add_argument("--height", type=int, default=1080)
p.add_argument("--frames", type=int, default=48)
p.add_argument("--rebin_every", type=int, default=8)
p.add_argument("--drift_px", type=float, default=1.5)
p.add_argument("--step_div", type=int, default=600,
               help="orbit step = 2*pi/step_div (600 = render_video default)")
p.add_argument("--sh_degree", type=int, default=3,
               help="active SH degree (2 = a distilled model's eval point)")
p.add_argument("--headroom", type=float, default=1.35,
               help="snug-capacity headroom over the first frame's live count")
args = p.parse_args()

BG = jnp.zeros((3,), jnp.float32)
STEP = 2 * math.pi / args.step_div


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
        n=args.n, seed=0, extent=2.0, scale_range=(0.004, 0.02),
        active_sh_degree=args.sh_degree,
    )
    cams = [orbit_cam(0.2 + i * STEP) for i in range(args.frames)]

    cap_default = default_max_instances(scene, cams[0])

    def make_fresh(cap):
        return jax.jit(lambda c: render(scene, c, BG, max_instances=cap, fast=True).render)

    fresh_default = make_fresh(cap_default)
    img0 = fresh_default(cams[0])
    from lightgaussian_tpu.ops.rasterize.binning import snug_capacity

    total = int(render(scene, cams[0], BG, max_instances=cap_default).num_instances)
    cap_snug = snug_capacity(total, headroom=args.headroom)
    print(f"live instances {total}; default cap {cap_default}, snug {cap_snug}",
          file=sys.stderr)

    fresh_snug = make_fresh(cap_snug)
    bin_fn = jax.jit(lambda c: build_binning(scene, c, max_instances=cap_snug))
    cached_fn = jax.jit(
        lambda c, b: render(scene, c, BG, cached_binning=b, fast=True).render)

    ms_a = bench(fresh_default, cams)
    ms_b = bench(fresh_snug, cams)

    def bench_schedule(flags):
        # mirror render_trajectory: a keyframe whose binning is never reused
        # (next frame rebins too) goes through the fused fresh render
        n = len(flags)
        reused = [i + 1 < n and not flags[i + 1] for i in range(n)]
        binning = bin_fn(cams[0])
        for c in cams[:4]:
            out = cached_fn(c, binning)
        out = fresh_snug(cams[0])
        jax.block_until_ready(out)
        t0 = time.time()
        for i, c in enumerate(cams):
            if flags[i] and not reused[i]:
                out = fresh_snug(c)
                continue
            if flags[i]:
                binning = bin_fn(c)
            out = cached_fn(c, binning)
        jax.block_until_ready(out)
        return (time.time() - t0) / len(cams) * 1e3

    def worst_psnr(flags):
        binning, worst = None, 100.0
        for i, c in enumerate(cams):
            if flags[i]:
                binning = bin_fn(c)
                continue
            a = jnp.clip(cached_fn(c, binning), 0, 1)
            b = jnp.clip(fresh_snug(c), 0, 1)
            worst = min(worst, float(losses.psnr(a, b)))
        return worst

    flags_c = [i % args.rebin_every == 0 for i in range(len(cams))]
    ms_c = bench_schedule(flags_c)
    worst_c = worst_psnr(flags_c)

    flags_d = plan_rebin_schedule(scene, cams, args.rebin_every, args.drift_px)
    n_rebin = sum(flags_d)
    ms_d = bench_schedule(flags_d)
    worst_d = worst_psnr(flags_d) if n_rebin < len(cams) else float("inf")

    print(f"A fresh @default cap : {ms_a:7.2f} ms/frame = {1e3 / ms_a:6.1f} FPS")
    print(f"B fresh @snug cap    : {ms_b:7.2f} ms/frame = {1e3 / ms_b:6.1f} FPS")
    print(f"C cached (rebin {args.rebin_every:2d})  : {ms_c:7.2f} ms/frame = "
          f"{1e3 / ms_c:6.1f} FPS ; worst reused-frame PSNR {worst_c:.1f} dB")
    print(f"D drift-gated {args.drift_px:4.1f}px  : {ms_d:7.2f} ms/frame = "
          f"{1e3 / ms_d:6.1f} FPS ; {n_rebin}/{len(cams)} frames rebinned ; "
          f"worst reused-frame PSNR {worst_d:.1f} dB")
    print(f"speedup C/A: {ms_a / ms_c:.2f}x ; D/A: {ms_a / ms_d:.2f}x")


if __name__ == "__main__":
    main()
