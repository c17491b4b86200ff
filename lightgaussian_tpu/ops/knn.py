"""Mean squared distance to the 3 nearest neighbors, for Gaussian scale init.

TPU-native equivalent of the reference's `simple_knn._C.distCUDA2`
(`/root/reference/submodules/simple-knn/spatial.cu:14-24`, `simple_knn.cu:147-183`):
the CUDA kernel Morton-sorts points into 1024-point boxes and searches neighbor
boxes; here we Morton-sort with `jnp.argsort` and do a windowed candidate search
with a vectorized gather + `top_k` — the same locality idea, expressed as three
XLA ops instead of a hand-rolled radix sort. Both are approximate in the same
way (candidates limited to Morton-order neighbors); exactness only needs to match
the "mean 3-NN squared distance" semantics used for initialization
(`/root/reference/scene/gaussian_model.py:152-156`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _expand_bits_10(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton_codes(points: jnp.ndarray, perm=(0, 1, 2)) -> jnp.ndarray:
    """[N, 3] float points -> [N] uint32 30-bit Morton codes (10 bits/axis),
    like `coord2Morton` (`simple_knn.cu:45-70`). `perm` permutes which axis
    gets which bit lane, yielding a differently-ordered space-filling curve."""
    mins = points.min(axis=0)
    maxs = points.max(axis=0)
    scaled = (points - mins) / jnp.maximum(maxs - mins, 1e-12)
    q = jnp.clip((scaled * 1023.0).astype(jnp.uint32), 0, 1023)
    return (
        _expand_bits_10(q[:, perm[0]])
        | (_expand_bits_10(q[:, perm[1]]) << 1)
        | (_expand_bits_10(q[:, perm[2]]) << 2)
    )


def _window_candidates(points: jnp.ndarray, perm, window: int) -> jnp.ndarray:
    """Candidate neighbor indices [N, 2*window] from one Morton ordering."""
    n = points.shape[0]
    order = jnp.argsort(morton_codes(points, perm))
    offs = np.concatenate([np.arange(-window, 0), np.arange(1, window + 1)])
    pos = jnp.clip(jnp.arange(n)[:, None] + offs[None, :], 0, n - 1)
    cand = order[pos]  # neighbor ids in original numbering, per sorted row
    # un-sort: row i of output = candidates of original point order[i]
    out = jnp.zeros((n, offs.size), jnp.int32).at[order].set(cand.astype(jnp.int32))
    return out


@functools.partial(jax.jit, static_argnames=("window",))
def mean_sq_dist_to_3nn(points: jnp.ndarray, window: int = 24) -> jnp.ndarray:
    """Approximate mean squared distance to each point's 3 nearest neighbors.

    Candidates come from +/-`window` neighbors along THREE Morton orderings
    (axis-permuted bit interleavings), merged and deduplicated — the same
    bounded-locality idea as the CUDA reference's +/-3-box search
    (`simple_knn.cu:147-183`), with multiple curves to cover curve-boundary
    failure cases. Returns [N] float32.
    """
    n = points.shape[0]
    perms = ((0, 1, 2), (1, 2, 0), (2, 0, 1))
    idx = jnp.concatenate(
        [_window_candidates(points, p, window) for p in perms], axis=1
    )  # [N, 6*window]
    # Dedupe within each row: sort ids, mask repeats.
    idx = jnp.sort(idx, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((n, 1), bool), idx[:, 1:] == idx[:, :-1]], axis=1
    )
    d2 = ((points[idx] - points[:, None, :]) ** 2).sum(-1)
    d2 = jnp.where(dup | (idx == jnp.arange(n)[:, None]), jnp.inf, d2)
    smallest3 = -jax.lax.top_k(-d2, 3)[0]
    return jnp.where(jnp.isinf(smallest3), 0.0, smallest3).mean(axis=-1)


def mean_sq_dist_to_3nn_exact(points: jnp.ndarray) -> jnp.ndarray:
    """Exact O(N^2) version for tests / small point sets."""
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    n = points.shape[0]
    d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
    smallest3 = -jax.lax.top_k(-d2, 3)[0]
    return smallest3.mean(axis=-1)


def mean_sq_dist_to_3nn_host(points: np.ndarray, window: int = 24) -> np.ndarray:
    """Host-side entry for initialization-time use: the native C++ path
    (`native/src/lg_native.cpp` — same Morton-window algorithm, exact parity
    with the jitted path's semantics) when the library is available, else the
    jitted XLA path. Returns numpy [N] float32."""
    from lightgaussian_tpu import native

    out = native.knn3_mean_sq_dist(np.asarray(points, np.float32), window)
    if out is not None:
        return out
    return np.asarray(mean_sq_dist_to_3nn(jnp.asarray(points, jnp.float32), window))
