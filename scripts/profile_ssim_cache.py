"""A/B the cached-GT-moments SSIM path on chip (round 4).

Times grad(gs_loss) at 3x1080p in isolation: the plain 5-plane moment path
vs `target_stats=` (3-plane forward + 3-plane cotangent blur). The GT blur
moments are per-camera constants in training, so the delta here is pure
hoisted work. Prints ms per call for both paths.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from lightgaussian_tpu.ops import losses

H, W = 1080, 1920
ITERS = 30


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / ITERS * 1e3


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (3, H, W), jnp.float32)
    y = jax.random.uniform(k2, (3, H, W), jnp.float32)
    stats = jax.jit(losses.precompute_ssim_target_stats)(y)
    jax.block_until_ready(stats)

    g_plain = jax.jit(jax.grad(lambda a: losses.gs_loss(a, y)))
    g_cached = jax.jit(jax.grad(lambda a: losses.gs_loss(a, y, target_stats=stats)))
    f_plain = jax.jit(lambda a: losses.gs_loss(a, y))
    f_cached = jax.jit(lambda a: losses.gs_loss(a, y, target_stats=stats))

    # Value check on chip first
    v0 = float(f_plain(x))
    v1 = float(f_cached(x))
    print(f"value plain={v0:.7f} cached={v1:.7f} |d|={abs(v0-v1):.2e}")
    import numpy as np
    d0 = np.asarray(g_plain(x))
    d1 = np.asarray(g_cached(x))
    print(f"grad max|d|={np.abs(d0-d1).max():.2e} (scale {np.abs(d0).max():.2e})")

    print(f"fwd  plain : {timeit(f_plain, x):7.2f} ms")
    print(f"fwd  cached: {timeit(f_cached, x):7.2f} ms")
    print(f"grad plain : {timeit(g_plain, x):7.2f} ms")
    print(f"grad cached: {timeit(g_cached, x):7.2f} ms")


if __name__ == "__main__":
    main()
