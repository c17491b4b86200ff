"""Oracle rasterizer: exact, pure-jnp, differentiable via autodiff.

Reproduces the sequential per-pixel front-to-back blend of the CUDA reference
(SURVEY.md §2.1a) without tiles: every (Gaussian, pixel) pair whose pixel tile
overlaps the Gaussian's 3-sigma rect is considered, in depth order, with the
reference's skip (alpha < 1/255), clamp (alpha <= 0.99) and early-stop
(T*(1-alpha) < 1e-4 => not applied, frozen T) semantics.

The sequential done-flag is re-expressed as a *masked prefix-product*: with
T_i the "naive" transmittance (product over all eligible earlier alphas) the
stop test T_i*(1-alpha_i) >= T_EPS is monotone non-increasing in i, so
"apply iff the test passes" is exactly equivalent to the reference's frozen
done flag. This closed form is what both this oracle and the fast Pallas path
implement, so they agree bit-for-bit up to float reassociation.

Slow (O(N * H * W)) — used as the test oracle and for tiny scenes only.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lightgaussian_tpu.ops.rasterize.projection import (
    ALPHA_EPS,
    MAX_ALPHA,
    T_EPS,
    Splats,
)


def blend_reference(
    splats: Splats,
    width: int,
    height: int,
    bg: jnp.ndarray,
    tile_size: int = 0,
    chunk: int = 64,
    with_counts: bool = False,
):
    """Blend depth-sorted splats over the full image.

    Args:
      tile_size: if > 0, restrict each Gaussian to pixels whose `tile_size`
        tile overlaps its radius rect (matches the tiled fast path exactly).
      with_counts: also return per-Gaussian (hit_count, imp_score) — the
        f_count outputs (`gaussian_renderer/__init__.py:156-229` semantics).

    Returns:
      image [3, H, W], final_T [H, W], and if with_counts a (count[N], imp[N])
      pair in the *original* Gaussian order.
    """
    n = splats.depth.shape[0]
    order = jnp.argsort(splats.depth)
    mean2d = splats.mean2d[order]
    conic = splats.conic[order]
    color = splats.color[order]
    opacity = splats.opacity[order]
    radius = splats.radius[order]

    hw = height * width
    px = jnp.arange(width, dtype=jnp.float32)
    py = jnp.arange(height, dtype=jnp.float32)
    pix_x = jnp.tile(px, height)  # [HW]
    pix_y = jnp.repeat(py, width)

    pad = (-n) % chunk
    if pad:
        def padz(x):
            cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, cfg)
        mean2d, conic, color, radius = map(padz, (mean2d, conic, color, radius))
        opacity = jnp.pad(opacity, (0, pad))
    n_pad = n + pad
    n_chunks = n_pad // chunk

    def reshape_chunks(x):
        return x.reshape((n_chunks, chunk) + x.shape[1:])

    chunks = jax.tree.map(
        reshape_chunks, (mean2d, conic, color, opacity, radius)
    )

    def body(carry, ch):
        rgb_acc, t_naive, count_acc_dummy = carry
        m2, con, col, opa, rad = ch
        dx = pix_x[None, :] - m2[:, 0:1]  # [chunk, HW]
        dy = pix_y[None, :] - m2[:, 1:2]
        power = (
            -0.5 * (con[:, 0:1] * dx * dx + con[:, 2:3] * dy * dy)
            - con[:, 1:2] * dx * dy
        )
        alpha = jnp.minimum(MAX_ALPHA, opa[:, None] * jnp.exp(power))
        eligible = (power <= 0.0) & (alpha >= ALPHA_EPS) & (rad[:, None] > 0)
        if tile_size > 0:
            # Same clamped [lo, hi) rect as binning.tile_rect, so the oracle and
            # the tiled fast path consider identical (Gaussian, pixel) pairs.
            from lightgaussian_tpu.ops.rasterize import binning as _binning

            grid = _binning.make_grid(width, height, tile_size)
            lo_x, lo_y, hi_x, hi_y, _cnt = _binning.tile_rect(m2, rad, grid, tile_size)
            tile_px = (pix_x / tile_size).astype(jnp.int32)
            tile_py = (pix_y / tile_size).astype(jnp.int32)
            in_rect = (
                (tile_px[None, :] >= lo_x[:, None])
                & (tile_px[None, :] < hi_x[:, None])
                & (tile_py[None, :] >= lo_y[:, None])
                & (tile_py[None, :] < hi_y[:, None])
            )
            eligible = eligible & in_rect
        alpha = jnp.where(eligible, alpha, 0.0)

        # Naive transmittance prefix within the chunk, seeded by the carry.
        log1m = jnp.log1p(-alpha)
        ecs = jnp.cumsum(log1m, axis=0) - log1m  # exclusive prefix
        t_i = t_naive[None, :] * jnp.exp(ecs)
        apply = (t_i * (1.0 - alpha)) >= T_EPS
        w = jnp.where(apply, alpha * t_i, 0.0)  # [chunk, HW]

        # HIGHEST precision: the oracle must be exact f32 — on TPU the default
        # matmul precision is bf16, which would put ~3e-3 of error in the
        # ORACLE itself and mask (or fake) compiled-kernel parity failures.
        rgb_acc = rgb_acc + jnp.matmul(w.T, col, precision=jax.lax.Precision.HIGHEST)
        # Actual T freezes once `apply` fails (monotone), so the masked product
        # IS the frozen T; naive T keeps decreasing and only drives the test.
        t_naive_new = t_naive * jnp.exp(jnp.sum(log1m, axis=0))
        t_actual_mult = jnp.exp(jnp.sum(jnp.where(apply, log1m, 0.0), axis=0))
        w_sum = w.sum(axis=1)  # per-gaussian imp contribution
        hits = (w > 0.0).sum(axis=1)
        return (rgb_acc, t_naive_new, count_acc_dummy * t_actual_mult), (w_sum, hits)

    # carry t tracks the *naive* product; actual T tracked in 3rd slot.
    init = (
        jnp.zeros((hw, 3), jnp.float32),
        jnp.ones((hw,), jnp.float32),
        jnp.ones((hw,), jnp.float32),
    )
    (rgb_acc, _, t_actual), (w_sums, hit_counts) = jax.lax.scan(body, init, chunks)

    image = rgb_acc + t_actual[:, None] * bg[None, :]
    image = image.T.reshape(3, height, width)
    final_t = t_actual.reshape(height, width)

    if not with_counts:
        return image, final_t

    w_sums = w_sums.reshape(n_pad)[:n]
    hit_counts = hit_counts.reshape(n_pad)[:n]
    imp = jnp.zeros(n, jnp.float32).at[order].set(w_sums)
    cnt = jnp.zeros(n, jnp.int32).at[order].set(hit_counts)
    return image, final_t, cnt, imp
