"""Image losses: L1, L2, windowed SSIM, PSNR, and the 3D-GS combined loss.

Semantics match the reference (`/root/reference/utils/loss_utils.py:18-85`,
`utils/image_utils.py:15-21`): SSIM uses an 11x11 Gaussian window (sigma=1.5),
C1=0.01^2, C2=0.03^2, zero 'same' padding, per-channel depthwise convolution,
mean over all pixels/channels.

The separable blur runs as one fused Pallas kernel on TPU (both directions in
VMEM, one pass over HBM — the XLA shifted-sum form re-reads every element ~22
times). The symmetric window with zero 'same' padding makes the blur operator
self-adjoint, so its custom VJP is the blur itself. Off-TPU (and for the CPU
test suite) a pure-jnp shifted-sum path with identical accumulation order is
used.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target).mean()


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return ((pred - target) ** 2).mean()


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return ((pred - target) ** 2).mean()


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Peak SNR over the whole image batch, peak=1.0 (`image_utils.py:19`)."""
    m = mse(pred, target)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(m, 1e-20)))


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """`img2mse` (`loss_utils.py:88-92`): masked sum-of-squares / mask mass."""
    if mask is None:
        return mse(pred, target)
    d = pred * mask - target * mask
    return (d * d).sum() / (mask.sum() + 1e-5)


def masked_mae(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """`img2mae` (`loss_utils.py:95-99`)."""
    if mask is None:
        return l1_loss(pred, target)
    return jnp.abs(pred * mask - target * mask).sum() / (mask.sum() + 1e-5)


@functools.lru_cache(maxsize=4)
def _gaussian_taps(window_size: int, sigma: float):
    import numpy as np

    xs = np.arange(window_size, dtype=np.float64) - window_size // 2
    g = np.exp(-(xs**2) / (2.0 * sigma**2))
    return tuple((g / g.sum()).astype(np.float32).tolist())


def _blur_jnp(x: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Shift-and-add separable blur (reference path; any backend)."""
    taps = _gaussian_taps(window_size, sigma)
    r = window_size // 2
    _, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (r, r)))
    x = sum(t * xp[:, :, i:i + w] for i, t in enumerate(taps))
    xp = jnp.pad(x, ((0, 0), (r, r), (0, 0)))
    return sum(t * xp[:, i:i + h, :] for i, t in enumerate(taps))


_BLUR_CB = 3  # channels per grid step
_BLUR_HB = 64  # output rows per grid step


def _blur_kernel(x_hbm, out_block, buf, acc, sem, *, taps, hb, halo, w):
    c, h = pl.program_id(0), pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(c * _BLUR_CB, _BLUR_CB), pl.ds(h * hb, halo), :],
        buf,
        sem,
    )
    cp.start()
    cp.wait()
    # Accumulate through refs, one tap per statement: an unrolled sum of 11
    # shifted slices would keep all 11 multi-MB temporaries live on the Mosaic
    # VMEM stack at once and blow the 16 MiB scoped-vmem limit.
    acc[...] = taps[0] * buf[:, 0:hb, :]
    for k in range(1, len(taps)):
        acc[...] = acc[...] + taps[k] * buf[:, k:k + hb, :]
    out_block[...] = taps[0] * acc[:, :, 0:w]
    for k in range(1, len(taps)):
        out_block[...] = out_block[...] + taps[k] * acc[:, :, k:k + w]


def _blur_pallas_raw(x: jnp.ndarray, window_size: int, sigma: float, interpret: bool) -> jnp.ndarray:
    taps = _gaussian_taps(window_size, sigma)
    r = window_size // 2
    c, h, w = x.shape
    nc = -(-c // _BLUR_CB)
    hb = min(_BLUR_HB, ((h + 7) // 8) * 8)
    nh = -(-h // hb)
    halo = ((hb + 2 * r + 7) // 8) * 8  # DMA slice height must be 8-aligned
    wp = ((w + 2 * r + 127) // 128) * 128  # DMA width must be 128-aligned
    xp = jnp.pad(
        x,
        ((0, nc * _BLUR_CB - c), (r, (halo - hb - r) + nh * hb - h), (r, wp - w - r)),
    )  # zero 'same' padding + block/halo alignment
    kernel = functools.partial(_blur_kernel, taps=taps, hb=hb, halo=halo, w=w)
    out = pl.pallas_call(
        kernel,
        grid=(nc, nh),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (_BLUR_CB, hb, w), lambda ci, hi: (ci, hi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nc * _BLUR_CB, nh * hb, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_BLUR_CB, halo, wp), jnp.float32),
            pltpu.VMEM((_BLUR_CB, hb, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp)
    return out[:c, :h, :]


def _blur5_kernel(xy_hbm, out_block, buf, der, acc, sem, *, taps, hb, halo, w):
    """One channel pair (x_c, y_c) -> the five blurred SSIM moment planes
    B(x), B(y), B(x^2), B(y^2), B(x*y), products formed in VMEM so the
    15-channel stacked tensor never exists in HBM."""
    c, h = pl.program_id(0), pl.program_id(1)
    cp = pltpu.make_async_copy(
        xy_hbm.at[pl.ds(c * 2, 2), pl.ds(h * hb, halo), :], buf, sem
    )
    cp.start()
    cp.wait()
    der[0] = buf[0]
    der[1] = buf[1]
    der[2] = buf[0] * buf[0]
    der[3] = buf[1] * buf[1]
    der[4] = buf[0] * buf[1]
    acc[...] = taps[0] * der[:, 0:hb, :]
    for k in range(1, len(taps)):
        acc[...] = acc[...] + taps[k] * der[:, k:k + hb, :]
    out_block[...] = taps[0] * acc[:, :, 0:w]
    for k in range(1, len(taps)):
        out_block[...] = out_block[...] + taps[k] * acc[:, :, k:k + w]


def _blur5_pallas_raw(img1, img2, window_size: int, sigma: float, interpret: bool):
    """[C, H, W] x2 -> [C*5, H, W] blurred moment planes (channel-major:
    plane k of channel c lands at index c*5 + k)."""
    taps = _gaussian_taps(window_size, sigma)
    r = window_size // 2
    c, h, w = img1.shape
    # 5 derived planes + halo buffer + tap temporaries live on the Mosaic VMEM
    # stack at once; 32 output rows keeps the kernel under the 16 MiB scoped
    # limit at 1080p (64 rows hits 22.5 MiB).
    hb = min(32, ((h + 7) // 8) * 8)
    nh = -(-h // hb)
    halo = ((hb + 2 * r + 7) // 8) * 8
    wp = ((w + 2 * r + 127) // 128) * 128
    xy = jnp.concatenate([img1[:, None], img2[:, None]], axis=1).reshape(2 * c, h, w)
    xyp = jnp.pad(
        xy, ((0, 0), (r, (halo - hb - r) + nh * hb - h), (r, wp - w - r))
    )
    kernel = functools.partial(_blur5_kernel, taps=taps, hb=hb, halo=halo, w=w)
    out = pl.pallas_call(
        kernel,
        grid=(c, nh),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (5, hb, w), lambda ci, hi: (ci, hi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c * 5, nh * hb, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, halo, wp), jnp.float32),
            pltpu.VMEM((5, halo, wp), jnp.float32),
            pltpu.VMEM((5, hb, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xyp)
    return out[:, :h, :]


def _blur3_kernel(xy_hbm, out_block, buf, der, acc, sem, *, taps, hb, halo, w):
    """One channel pair (x_c, y_c) -> the three x-side blurred SSIM moment
    planes B(x), B(x^2), B(x*y). The target-only planes B(y), B(y^2) are
    per-camera constants in training and are precomputed once
    (`precompute_ssim_target_stats`), so recomputing them every step is pure
    waste — this kernel is `_blur5_kernel` minus those two planes (-40% of
    the moment blur's derive/accumulate work and output traffic)."""
    c, h = pl.program_id(0), pl.program_id(1)
    cp = pltpu.make_async_copy(
        xy_hbm.at[pl.ds(c * 2, 2), pl.ds(h * hb, halo), :], buf, sem
    )
    cp.start()
    cp.wait()
    der[0] = buf[0]
    der[1] = buf[0] * buf[0]
    der[2] = buf[0] * buf[1]
    acc[...] = taps[0] * der[:, 0:hb, :]
    for k in range(1, len(taps)):
        acc[...] = acc[...] + taps[k] * der[:, k:k + hb, :]
    out_block[...] = taps[0] * acc[:, :, 0:w]
    for k in range(1, len(taps)):
        out_block[...] = out_block[...] + taps[k] * acc[:, :, k:k + w]


def _blur3_pallas_raw(img1, img2, window_size: int, sigma: float, interpret: bool):
    """[C, H, W] x2 -> [C*3, H, W] x-side moment planes (channel-major:
    plane k of channel c lands at index c*3 + k)."""
    taps = _gaussian_taps(window_size, sigma)
    r = window_size // 2
    c, h, w = img1.shape
    hb = min(32, ((h + 7) // 8) * 8)
    nh = -(-h // hb)
    halo = ((hb + 2 * r + 7) // 8) * 8
    wp = ((w + 2 * r + 127) // 128) * 128
    xy = jnp.concatenate([img1[:, None], img2[:, None]], axis=1).reshape(2 * c, h, w)
    xyp = jnp.pad(
        xy, ((0, 0), (r, (halo - hb - r) + nh * hb - h), (r, wp - w - r))
    )
    kernel = functools.partial(_blur3_kernel, taps=taps, hb=hb, halo=halo, w=w)
    out = pl.pallas_call(
        kernel,
        grid=(c, nh),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (3, hb, w), lambda ci, hi: (ci, hi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c * 3, nh * hb, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, halo, wp), jnp.float32),
            pltpu.VMEM((3, halo, wp), jnp.float32),
            pltpu.VMEM((3, hb, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xyp)
    return out[:, :h, :]


@functools.lru_cache(maxsize=8)
def _ssim_moments_fused_xside(window_size: int, sigma: float, interpret: bool):
    """Fused x-side SSIM moment blur (cached-target path) with hand VJP.

    Forward: one Pallas pass from (x, y) to the three planes B(x), B(x^2),
    B(x*y) per channel. Backward blurs only the THREE cotangent planes (the
    full-moment VJP blurs five): dx = B(g0) + 2x*B(g1) + y*B(g2). dy is
    returned as ZERO, not the partial x*B(g2) through the x*y plane: the y
    paths through the PRECOMPUTED B(y), B(y^2) stats are absent here by
    design (the target is a constant in training), and a partial cotangent
    would be a silently wrong gradient for any caller that differentiated
    w.r.t. y — zeros make the "target is constant" contract explicit.
    `ssim()` additionally stop_gradients img2 on this path."""

    @jax.custom_vjp
    def moments(x, y):
        return _blur3_pallas_raw(x, y, window_size, sigma, interpret)

    def fwd(x, y):
        return moments(x, y), (x, y)

    def bwd(res, g):
        x, y = res
        c = x.shape[0]
        gb = _blur_pallas_raw(g, window_size, sigma, interpret)
        gb = gb.reshape(c, 3, *x.shape[1:])
        dx = gb[:, 0] + 2.0 * x * gb[:, 1] + y * gb[:, 2]
        return dx, jnp.zeros_like(y)

    moments.defvjp(fwd, bwd)
    return moments


@functools.lru_cache(maxsize=8)
def _ssim_moments_fused(window_size: int, sigma: float, interpret: bool):
    """Fused SSIM moment blur with a hand-written VJP.

    Forward: one Pallas pass from (x, y) to the five blurred moment planes per
    channel. Backward: the blur is self-adjoint, so for cotangents g_k of the
    five planes, dx = B(g0) + 2x*B(g2) + y*B(g4) and
    dy = B(g1) + 2y*B(g3) + x*B(g4) — one 5C-channel blur plus elementwise
    combines, instead of autodiff's product-chain over a materialized
    15-channel stack."""

    @jax.custom_vjp
    def moments(x, y):
        return _blur5_pallas_raw(x, y, window_size, sigma, interpret)

    def fwd(x, y):
        return moments(x, y), (x, y)

    def bwd(res, g):
        x, y = res
        c = x.shape[0]
        gb = _blur_pallas_raw(g, window_size, sigma, interpret)
        gb = gb.reshape(c, 5, *x.shape[1:])
        dx = gb[:, 0] + 2.0 * x * gb[:, 2] + y * gb[:, 4]
        dy = gb[:, 1] + 2.0 * y * gb[:, 3] + x * gb[:, 4]
        return dx, dy

    moments.defvjp(fwd, bwd)
    return moments


@functools.lru_cache(maxsize=8)
def _blur_self_adjoint(window_size: int, sigma: float, interpret: bool):
    """Pallas blur wrapped in its own (self-adjoint) VJP: d(blur)^T = blur."""

    @jax.custom_vjp
    def blur(x):
        return _blur_pallas_raw(x, window_size, sigma, interpret)

    def fwd(x):
        return blur(x), None

    def bwd(_, g):
        return (blur(g),)

    blur.defvjp(fwd, bwd)
    return blur


def _separable_blur(x: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """[C, H, W] -> same-shape Gaussian blur with zero 'same' padding.

    The 11x11 window is an outer product, so two 11-tap passes replace the
    121-tap grouped conv (which has terrible MXU utilization at 3 channels).
    On TPU both passes run fused in one Pallas kernel (one HBM round trip).
    """
    if jax.default_backend() in ("tpu", "axon"):
        return _blur_self_adjoint(window_size, float(sigma), False)(x)
    return _blur_jnp(x, window_size, sigma)


def precompute_ssim_target_stats(
    target: jnp.ndarray, window_size: int = 11, sigma: float = 1.5
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-camera constant SSIM moments of a fixed target image.

    Returns (B(y), B(y^2)) for a [C, H, W] target. In the training loop the
    ground-truth image never changes, so these two of the five moment planes
    are hoisted out of the per-step loss: `ssim(pred, gt, target_stats=...)`
    then blurs only the three prediction-side planes forward and three
    cotangent planes backward. Storage: 2 extra [C, H, W] f32 planes per
    cached camera (~12.4 MB at 3x1080p)."""
    stacked = jnp.concatenate([target, target * target], axis=0)
    blurred = _separable_blur(stacked, window_size, sigma)
    c = target.shape[0]
    return blurred[:c], blurred[c:]


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    target_stats: tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """Mean SSIM over a [C, H, W] image pair (`loss_utils.py:26-85`).

    `target_stats`: optional precomputed (B(img2), B(img2^2)) from
    `precompute_ssim_target_stats` — skips re-blurring the constant target
    every call. Gradients flow to img1 only on that path (img2 is treated as
    a constant, as in training)."""
    c = img1.shape[0]
    if target_stats is not None:
        img2 = jax.lax.stop_gradient(img2)
        mu2, s22 = target_stats
        if jax.default_backend() in ("tpu", "axon"):
            b = _ssim_moments_fused_xside(window_size, float(sigma), False)(img1, img2)
            b = b.reshape(c, 3, *img1.shape[1:])
            mu1, s11, s12 = b[:, 0], b[:, 1], b[:, 2]
        else:
            stacked = jnp.concatenate([img1, img1 * img1, img1 * img2], axis=0)
            blurred = _separable_blur(stacked, window_size, sigma)
            mu1, s11, s12 = (blurred[i * c:(i + 1) * c] for i in range(3))
    elif jax.default_backend() in ("tpu", "axon"):
        b = _ssim_moments_fused(window_size, float(sigma), False)(img1, img2)
        b = b.reshape(c, 5, *img1.shape[1:])
        mu1, mu2, s11, s22, s12 = b[:, 0], b[:, 1], b[:, 2], b[:, 3], b[:, 4]
    else:
        stacked = jnp.concatenate(
            [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=0
        )
        blurred = _separable_blur(stacked, window_size, sigma)
        mu1, mu2, s11, s22, s12 = (blurred[i * c:(i + 1) * c] for i in range(5))
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = s11 - mu1_sq
    sigma2_sq = s22 - mu2_sq
    sigma12 = s12 - mu1_mu2
    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2.0 * mu1_mu2 + c1) * (2.0 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()


def gs_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    lambda_dssim: float = 0.2,
    target_stats: tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """The 3D-GS training loss: (1-l)*L1 + l*(1 - SSIM)
    (`train_densify_prune.py:135-138`). `target_stats` (optional) are the
    precomputed SSIM moments of the constant ground-truth image."""
    return (1.0 - lambda_dssim) * l1_loss(pred, target) + lambda_dssim * (
        1.0 - ssim(pred, target, target_stats=target_stats)
    )
