"""Isolated A/B: segment_reduce_pre vs the lane-folded variant (round 4).

The unfolded [CAP, 16] cumsum leaves 112/128 lanes dead on every pass;
folding 8 rows into the lane axis packs them. Measures both at the bench
operating point (CAP 983,040, f=16, ~300k segments), plus the full
gather+reduce chain (concat + pre_pos gather + reduce) both ways.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from lightgaussian_tpu.ops.rasterize import binning

CAP = 983_040
N = 300_000
ITERS = 30


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        for _ in range(ITERS):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.time() - t0) / ITERS * 1e3)
    return best


def main():
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.normal(size=(CAP, 16)).astype(np.float32))
    counts = rng.multinomial(CAP - CAP // 4, np.ones(N) / N)
    cum = jnp.asarray(np.cumsum(counts).astype(np.int32))
    perm = jnp.asarray(rng.permutation(CAP).astype(np.int32))

    r_ref = jax.jit(binning.segment_reduce_pre)
    r_fold = jax.jit(binning.segment_reduce_pre_folded)
    a = np.asarray(r_ref(vals, cum))
    b = np.asarray(r_fold(vals, cum))
    print(f"max|d| reduce-only: {np.abs(a - b).max():.2e} (scale {np.abs(a).max():.1f})")

    print(f"reduce unfolded : {timeit(r_ref, vals, cum):6.2f} ms")
    print(f"reduce folded   : {timeit(r_fold, vals, cum):6.2f} ms")

    def chain(reduce_fn):
        @jax.jit
        def run(v, p, c):
            v = jnp.concatenate([v, jnp.zeros((1, v.shape[1]), v.dtype)])
            pre = v.at[p].get(unique_indices=True, mode="promise_in_bounds")
            return reduce_fn(pre, c)

        return run

    print(f"gather+reduce unfolded : {timeit(chain(binning.segment_reduce_pre), vals, perm, cum):6.2f} ms")
    print(f"gather+reduce folded   : {timeit(chain(binning.segment_reduce_pre_folded), vals, perm, cum):6.2f} ms")


if __name__ == "__main__":
    main()
