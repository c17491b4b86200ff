"""A/B the distill step's teacher render path on chip (round 4).

Times `make_distill_step` at the bench operating point (300k Gaussians,
1080p, snug capacity) with the teacher rendered through the exact training
kernel vs the render-only fast kernel (shipped). Pass --exact to time the
pre-round-4 form.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from lightgaussian_tpu.config import OptimizationParams
from lightgaussian_tpu.train.distill import init_student, make_distill_step
from lightgaussian_tpu.train.state import init_train_state
from lightgaussian_tpu.utils.synthetic import default_camera, random_scene

WIDTH, HEIGHT = 1920, 1080
N = 300_000
CAP = 983_040


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    teacher = random_scene(n=N, seed=0, extent=2.0, scale_range=(0.004, 0.02),
                           active_sh_degree=3)
    student = init_student(teacher, 2)
    state = init_train_state(student)
    camera = default_camera(width=WIDTH, height=HEIGHT, dist=5.0)
    bg = jnp.zeros((3,), jnp.float32)

    for fast in (True, False):
        step = make_distill_step(OptimizationParams(), 1.0, CAP, teacher_fast=fast)
        t0 = time.time()
        state2, m = step(state, teacher, camera, bg)
        jax.block_until_ready(m.loss)
        print(f"[teacher_fast={fast}] compile+first: {time.time()-t0:.1f}s "
              f"loss={float(m.loss):.6f} inst={int(m.num_instances)}")

        for _ in range(3):
            state2, m = step(state, teacher, camera, bg)
        jax.block_until_ready(m.loss)
        groups = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(args.iters):
                state2, m = step(state, teacher, camera, bg)
            jax.block_until_ready(m.loss)
            groups.append((time.time() - t0) / args.iters * 1e3)
        groups.sort()
        print(f"[teacher_fast={fast}] distill step: median {groups[1]:.1f} ms "
              f"(min {groups[0]:.1f}, max {groups[-1]:.1f})")


if __name__ == "__main__":
    main()
