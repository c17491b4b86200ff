"""Benchmark: fwd+bwd rendering throughput at 1080p on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: pixels/s/chip for a full differentiable render step (forward render of
a 1920x1080 view of a ~300k-Gaussian synthetic scene + L1/D-SSIM loss + backward
to all Gaussian parameters) — the hot loop of 3D-GS training (BASELINE.json).

vs_baseline divides by 15e6 pixels/s: the reference CUDA pipeline trains
MipNeRF360-scale scenes at roughly 15-20 it/s on ~1MP images on an RTX3090/A100
class GPU (30k iters in ~25-30 min), i.e. ~15M pixels/s fwd+bwd.

`bench.py --parity` instead runs the COMPILED-kernel parity gate on whatever
backend jax sees (the real chip under axon): Mosaic-compiled tiled forward
image, full parameter + mean2d-offset gradients, and counting outputs vs the
pure-jnp oracle, allclose at fp32 tolerances. The unit/CI tests run the same
comparisons but only in Pallas interpret mode on CPU (tests/test_rasterizer.py)
— this flag is the gate for the code path that actually ships. Exits non-zero
on mismatch.
"""
import argparse
import json
import math
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
# Steady-state instance capacity: the training loop's two-phase policy grows
# at 1.4x headroom during densification and snugs to 1.25x once counts
# stabilize (train/loop.py round 3; this scene bins 768,651 instances with
# the tight alpha-support rects + exact ellipse-tile intersection masks,
# snug_capacity(768651, 1.25) -> 983,040 at the 64k quantum); every
# per-instance binning cost scales with capacity, so bench uses the capacity
# real training settles at.
MAX_INSTANCES = 983_040
WARMUP, ITERS = 3, 10


def parity_gate() -> None:
    """Compiled tiled path vs jnp oracle on the live backend (VERDICT r1 #3)."""
    import numpy as np

    from lightgaussian_tpu.ops.rasterize import count_render

    t_start = time.time()
    dev = jax.devices()[0]
    print(f"parity gate on {dev.platform} ({dev.device_kind})", file=sys.stderr)

    # Multi-chunk, multi-tile scene: 2048 Gaussians at 192x128 bins thousands
    # of instances (several 128-instance chunks per tile row) so chunk-boundary
    # carries, boundary masking, and the segmented gradient reduction all get
    # exercised in the Mosaic-compiled kernels.
    scene = random_scene(n=2048, seed=1, extent=1.2, scale_range=(0.01, 0.06))
    camera = default_camera(width=192, height=128)
    bg = jnp.array([0.1, 0.2, 0.3], jnp.float32)
    rng = np.random.default_rng(0)
    weights = jnp.asarray(rng.normal(size=(3, camera.height, camera.width)), jnp.float32)
    failures = []

    def check(name, got, want, atol, normalize=False):
        a, b = np.asarray(got), np.asarray(want)
        if normalize:
            s = np.abs(b).max() + 1e-8
            a, b = a / s, b / s
        err = np.abs(a - b).max()
        ok = err <= atol
        print(f"  {name:28s} max|Δ|={err:.3e}  (atol {atol:.0e}) {'ok' if ok else 'FAIL'}",
              file=sys.stderr)
        if not ok:
            failures.append((name, float(err), atol))

    # --- forward image + final transmittance --------------------------------
    out_ref = jax.jit(lambda: render(scene, camera, bg, method="reference"))()
    out_tile = jax.jit(lambda: render(scene, camera, bg, method="tiled"))()
    n_inst = int(out_tile.num_instances)
    print(f"  binned instances: {n_inst}", file=sys.stderr)
    assert n_inst > 2000, "scene too sparse to exercise multi-chunk paths"
    # Tolerances: Mosaic and XLA order f32 sums differently and use different
    # exp approximations; measured deltas sit at ~6-8e-5 with identical
    # fragment sets (gaussians_count matches exactly), so 2e-4 is ~3x headroom
    # above numerical noise while still catching any real kernel regression
    # (a wrong chunk-boundary carry shows up at 1e-2+).
    check("forward image", out_tile.render, out_ref.render, 2e-4)
    check("final transmittance", out_tile.final_T, out_ref.final_T, 2e-4)

    # --- gradients to all params + the densification mean2d hook ------------
    def loss(params, offset, method):
        s = scene.with_params(params)
        o = render(s, camera, bg, mean2d_offset=offset, method=method)
        return (o.render * weights).sum()

    params = scene.params()
    zeros = jnp.zeros((scene.capacity, 2), jnp.float32)
    g_ref = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=2)(params, zeros, "reference")
    g_tile = jax.jit(jax.grad(loss, argnums=(0, 1)), static_argnums=2)(params, zeros, "tiled")
    for k in params:
        check(f"grad[{k}]", g_tile[0][k], g_ref[0][k], 2e-4, normalize=True)
        assert float(np.abs(np.asarray(g_ref[0][k])).max()) > 0, f"vacuous grad {k}"
    check("grad[mean2d_offset]", g_tile[1], g_ref[1], 2e-4, normalize=True)

    # --- render-only fast kernel vs exact forward ---------------------------
    # Compiled check of the inference path: diverges only on early-stopped
    # pixels (bound T_EPS/(1-MAX_ALPHA) = 1e-2; measured ~4e-4 — see
    # pallas_blend._fast_kernel).
    out_fast = jax.jit(lambda: render(scene, camera, bg, method="tiled", fast=True))()
    check("fast-kernel image", out_fast.render, out_tile.render, 2e-3)
    check("fast-kernel final T", out_fast.final_T, out_tile.final_T, 2e-3)

    # --- counting outputs (GSS accumulators) --------------------------------
    c_ref = jax.jit(lambda: count_render(scene, camera, bg, method="reference"))()
    c_tile = jax.jit(lambda: count_render(scene, camera, bg, method="tiled"))()
    check("important_score", c_tile.important_score, c_ref.important_score, 2e-4,
          normalize=True)  # scores are pixel-count-scale sums; compare relative
    ch, cr = np.asarray(c_tile.gaussians_count), np.asarray(c_ref.gaussians_count)
    n_diff = int((ch != cr).sum())
    # hit counts are integers accumulated from f32 alpha threshold comparisons;
    # compiled-vs-oracle rounding at the exact ALPHA_EPS boundary may flip a
    # handful of fragments — bound it tightly instead of requiring exactness
    print(f"  gaussians_count differing entries: {n_diff}/{ch.size}", file=sys.stderr)
    if n_diff > ch.size // 500:
        failures.append(("gaussians_count", n_diff, ch.size // 500))

    dt = time.time() - t_start
    if failures:
        print(json.dumps({"metric": "compiled_kernel_parity", "value": 0,
                          "unit": "bool", "failures": failures}))
        sys.exit(1)
    print(f"parity gate passed in {dt:.1f}s", file=sys.stderr)
    print(json.dumps({"metric": "compiled_kernel_parity", "value": 1, "unit": "bool",
                      "vs_baseline": 1.0}))


def main(batch: int = 1, iters: int = ITERS, repeats: int = 5):
    scene = random_scene(
        n=N_GAUSS, seed=0, extent=2.0, scale_range=(0.004, 0.02), active_sh_degree=3
    )
    bg = jnp.zeros((3,), jnp.float32)
    target = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)

    # Per-camera constant GT moments, precomputed once at staging like the
    # training loop does (train/loop.py:_attach_gt_ssim_stats; bit-identical
    # loss/grads, measured -2.4 ms on the isolated loss grad at 1080p).
    target_stats = jax.jit(losses.precompute_ssim_target_stats)(target)

    if batch == 1:
        camera = default_camera(width=WIDTH, height=HEIGHT, dist=5.0)

        def loss_fn(params):
            s = scene.with_params(params)
            out = render(s, camera, bg, max_instances=MAX_INSTANCES)
            return losses.gs_loss(out.render, target, target_stats=target_stats), out.num_instances

        step = jax.jit(jax.grad(loss_fn, has_aux=True))
    else:
        # Multi-camera batched step: mean loss over `batch` cameras per
        # backward (lax.map serialization like train.step's batched variant).
        from lightgaussian_tpu.models.camera import index_camera, stack_cameras
        from lightgaussian_tpu.models.camera import Camera

        cams = stack_cameras([
            Camera.look_at(
                eye=[5.0 * math.sin(0.2 + 0.01 * i), 0.6,
                     -5.0 * math.cos(0.2 + 0.01 * i)],
                target=[0, 0, 0], width=WIDTH, height=HEIGHT,
            )
            for i in range(batch)
        ])

        def loss_fn(params):
            s = scene.with_params(params)

            def one(i):
                out = render(s, index_camera(cams, i), bg, max_instances=MAX_INSTANCES)
                return losses.gs_loss(out.render, target), out.num_instances

            l, tot = jax.lax.map(one, jnp.arange(batch))
            return l.mean(), tot.max()

        step = jax.jit(jax.grad(loss_fn, has_aux=True))

    params = scene.params()
    t0 = time.time()
    grads, total = step(params)
    jax.block_until_ready(grads)
    print(
        f"compile+first step: {time.time()-t0:.1f}s, instances={int(total)}"
        f" (capacity {MAX_INSTANCES}, camera batch {batch})",
        file=sys.stderr,
    )

    for _ in range(WARMUP):
        grads, _ = step(params)
    jax.block_until_ready(grads)

    # Median-of-`repeats` timing groups with spread: single-run step times on
    # this box vary +-2-3 ms (tunnel/dispatch noise), and round-3's headline
    # drifted from the driver's capture by quoting a best run. The reported
    # number is the MEDIAN group; the spread is recorded alongside it so any
    # future "win" must clear the noise band to count.
    group_ms = []
    for _ in range(repeats):
        t0 = time.time()
        for _ in range(iters):
            grads, _ = step(params)
        jax.block_until_ready(grads)
        group_ms.append((time.time() - t0) / iters * 1e3)
    group_ms.sort()
    dt_ms = group_ms[len(group_ms) // 2]
    if len(group_ms) % 2 == 0:
        dt_ms = 0.5 * (dt_ms + group_ms[len(group_ms) // 2 - 1])

    pix_per_s = batch * WIDTH * HEIGHT / (dt_ms * 1e-3)
    print(
        f"step time: median {dt_ms:.1f} ms over {repeats}x{iters} iters "
        f"(min {group_ms[0]:.1f}, max {group_ms[-1]:.1f}; {batch} cameras)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "pixels_per_sec_per_chip_fwd_bwd_1080p",
                "value": round(pix_per_s),
                "unit": "pixels/s",
                "vs_baseline": round(pix_per_s / BASELINE_PIX_PER_S, 4),
                "median_ms": round(dt_ms, 2),
                "spread_ms": [round(group_ms[0], 2), round(group_ms[-1], 2)],
                "groups": repeats,
            }
        )
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", action="store_true",
                    help="run the compiled-kernel parity gate instead of the throughput bench")
    ap.add_argument("--batch", type=int, default=1,
                    help="cameras per step (multi-camera batched train step)")
    ap.add_argument("--iters", type=int, default=ITERS,
                    help="timed iterations per group")
    ap.add_argument("--repeats", type=int, default=5,
                    help="timing groups; the reported number is the median group")
    cli_args = ap.parse_args()
    if cli_args.parity:
        parity_gate()
    else:
        main(cli_args.batch, cli_args.iters, cli_args.repeats)
