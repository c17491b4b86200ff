"""Round-5 roofline closure: per-piece accounting for the ~15 ms/step that
PERF.md's round-4 roofline carried at measured values without floors —
preprocess fwd+VJP, the backward seed, and the post-cache loss fwd+bwd
(VERDICT r4 item 4). Same method as the kernel accounting: marginal cost by
stubbing pieces in context, byte counts against the measured stream cost.

Run on chip: python scripts/roofline_close.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp
import numpy as np

from lightgaussian_tpu.ops import losses
from lightgaussian_tpu.ops.rasterize import binning as binning_mod
from lightgaussian_tpu.ops.rasterize import pallas_blend as pk
from lightgaussian_tpu.ops.rasterize.binning import make_grid
from lightgaussian_tpu.ops.rasterize.projection import preprocess
from lightgaussian_tpu.ops.rasterize.tiled import _assemble_image, _tile_image
from lightgaussian_tpu.utils.synthetic import default_camera, random_scene

WIDTH, HEIGHT = 1920, 1080
N_GAUSS = 300_000
CAP = 983_040


def timeit(name, fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:56s} {dt:8.3f} ms")
    return dt


def main():
    scene = random_scene(n=N_GAUSS, seed=0, extent=2.0, scale_range=(0.004, 0.02),
                         active_sh_degree=3)
    camera = default_camera(width=WIDTH, height=HEIGHT, dist=5.0)
    grid = make_grid(WIDTH, HEIGHT)
    params = scene.params()
    gt = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(0), (3, HEIGHT, WIDTH)), 0, 1
    )

    # measured stream cost reference (same probe as roofline.py)
    big = jax.random.uniform(jax.random.PRNGKey(9), (CAP // 128, 16, 128), jnp.float32)
    dt = timeit("stream 64 MiB read+write (x+1)", jax.jit(lambda x: x + 1.0), big)
    tr = jax.jit(lambda x: x.transpose(0, 2, 1).reshape(-1, 16))
    dtt = timeit("unchunk transpose (shape-matched real op)", tr, big)
    print(f"  -> transpose-effective {2*big.nbytes/(dtt/1e3)/1e9:.0f} GB/s "
          "(the trustworthy stream cost; the x+1 probe dispatch-caches)")
    gbps = 2 * big.nbytes / (dt / 1e3) / 1e9
    print(f"  -> {gbps:.0f} GB/s effective stream cost\n")

    # ---------------- A. preprocess forward + VJP ----------------
    print("== A. preprocess fwd + VJP (the [N]-domain math) ==")

    def make_pre(colors=None, cov=None):
        def f(p):
            s = scene.with_params(p)
            sp = preprocess(s, camera, colors_precomp=colors, cov3d_precomp=cov)
            return sp
        return f

    colors_pc = jnp.zeros((N_GAUSS, 3), jnp.float32)
    cov_pc = jnp.zeros((N_GAUSS, 6), jnp.float32)

    sp0 = jax.jit(make_pre())(params)
    jax.block_until_ready(sp0)
    # cotangent as RUNTIME random values (a closure-constant / ones cotangent
    # lets XLA fold multiplications and under-measures the real step)
    kct = iter(jax.random.split(jax.random.PRNGKey(1), 16))
    ct = jax.tree.map(
        lambda x: (jax.random.normal(next(kct), x.shape, jnp.float32)
                   if x.dtype == jnp.float32 else None), sp0
    )
    import dataclasses as _dc
    ct = _dc.replace(ct, radius=np.zeros(sp0.radius.shape, jax.dtypes.float0))

    for tag, kw in [
        ("full", {}),
        ("SH stubbed (colors_precomp)", {"colors": colors_pc}),
        ("cov stubbed (cov3d_precomp)", {"cov": cov_pc}),
        ("both stubbed", {"colors": colors_pc, "cov": cov_pc}),
    ]:
        f = make_pre(**kw)
        timeit(f"  fwd {tag}", jax.jit(f), params)

        @jax.jit
        def vjp_f(p, c, _f=f):
            _out, pull = jax.vjp(_f, p)
            return pull(c)

        timeit(f"  fwd+VJP {tag}", vjp_f, params, ct)

    pb = 4 * N_GAUSS * (3 + 4 + 3 + 1 + 3 + 45)   # param bytes read
    sb = 4 * N_GAUSS * 17                          # splat bytes written
    print(f"  bytes: params {pb/1e6:.0f} MB, splats {sb/1e6:.0f} MB; "
          f"stream floor fwd ~{(pb+sb)/gbps/1e6:.2f} ms, "
          f"VJP ~{(pb+2*sb+pb)/gbps/1e6:.2f} ms (re-read + grad write)\n")

    # ---------------- B. backward seed ----------------
    print("== B. backward seed (r + pad/tile) ==")
    splats = jax.jit(lambda: preprocess(scene, camera))()
    b = jax.jit(lambda s: binning_mod.bin_splats(s, grid, CAP))(splats)
    tile_rgb, tile_t = pk.blend_forward(b.tile_starts, b.inst_chunks, grid, False)
    img_pad = _assemble_image(tile_rgb, grid)
    t_pad = _assemble_image(tile_t, grid)[0]
    image = img_pad[:, :HEIGHT, :WIDTH]
    final_t = t_pad[:HEIGHT, :WIDTH]
    g_image = jax.jit(jax.grad(lambda im: losses.gs_loss(im, gt)))(image)
    g_t = jnp.zeros_like(final_t)
    jax.block_until_ready((g_image, tile_rgb, tile_t))

    hp, wp = grid.tiles_y * 32, grid.tiles_x * 32

    @jax.jit
    def seed_current(image, final_t, g_image, g_t):
        r = (image * g_image).sum(axis=0) + final_t * g_t
        g_pad = jnp.zeros((3, hp, wp))
        g_pad = g_pad.at[:, :HEIGHT, :WIDTH].set(g_image)
        r_pad = jnp.zeros((1, hp, wp))
        r_pad = r_pad.at[0, :HEIGHT, :WIDTH].set(r)
        return _tile_image(g_pad, grid), _tile_image(r_pad, grid)

    tg0, tr0 = seed_current(image, final_t, g_image, g_t)
    jax.block_until_ready((tg0, tr0))
    timeit("  seed CURRENT ([H,W] r + two pad/tile passes)",
           seed_current, image, final_t, g_image, g_t)

    @jax.jit
    def seed_tiledomain(tile_rgb, tile_t, g_image, g_t):
        # tile g (and g_t) once; compute r directly on tile planes from the
        # kernel's own residuals — arithmetically identical per pixel:
        # r = sum_c (tile_rgb + bg*tile_t) * tile_g + tile_t * tile_gt,
        # pad pixels have tile_g == 0.
        g_pad = jnp.zeros((4, hp, wp))
        g_pad = g_pad.at[:3, :HEIGHT, :WIDTH].set(g_image)
        g_pad = g_pad.at[3, :HEIGHT, :WIDTH].set(g_t)
        tg4 = _tile_image(g_pad, grid)          # [T, 4, PIX]
        tile_g = tg4[:, :3]
        tile_gt = tg4[:, 3:]
        # bench bg is zeros; composite term folds away identically
        tile_r = (tile_rgb * tile_g).sum(axis=1, keepdims=True) + tile_t * tile_gt
        return tile_g, tile_r

    tg1, tr1 = seed_tiledomain(tile_rgb, tile_t, g_image, g_t)
    jax.block_until_ready((tg1, tr1))
    timeit("  seed TILE-DOMAIN (one 4-plane pad/tile, r on tiles)",
           seed_tiledomain, tile_rgb, tile_t, g_image, g_t)
    print(f"  max |delta| tile_g {float(jnp.abs(tg1 - tg0).max()):.2e}, "
          f"tile_r {float(jnp.abs(tr1[:, 0] - tr0[:, 0]).max()):.2e}")
    sb_ = 4 * (3 * HEIGHT * WIDTH)
    print(f"  bytes CURRENT ~{(5*sb_ + 2*sb_/3 + 2*sb_ + 2*sb_/3)/1e6:.0f} MB, "
          f"TILE-DOMAIN ~{(2*(sb_*4/3) + sb_ + sb_/3 + sb_/3)/1e6:.0f} MB\n")

    # ---------------- C. post-cache loss fwd + bwd ----------------
    print("== C. loss (L1 + D-SSIM, cached GT moments) ==")
    stats = jax.jit(losses.precompute_ssim_target_stats)(gt)
    jax.block_until_ready(stats)

    def loss_fn(im, g, st):
        l1 = losses.l1_loss(im, g)
        s = losses.ssim(im, g, target_stats=st)
        return 0.8 * l1 + 0.2 * (1.0 - s)

    timeit("  loss fwd (cached stats)", jax.jit(loss_fn), image, gt, stats)
    timeit("  loss fwd+bwd (cached stats)",
           jax.jit(lambda im, g, st: jax.grad(loss_fn)(im, g, st)), image, gt, stats)

    def loss_nol1(im, g, st):
        return 0.2 * (1.0 - losses.ssim(im, g, target_stats=st))

    timeit("  SSIM-only fwd+bwd",
           jax.jit(lambda im, g, st: jax.grad(loss_nol1)(im, g, st)), image, gt, stats)
    timeit("  L1-only fwd+bwd",
           jax.jit(lambda im, g: jax.grad(losses.l1_loss)(im, g)), image, gt)
    timeit("  xside blur kernel alone (fwd 3-plane)",
           jax.jit(lambda im, g: losses._blur3_pallas_raw(im, g, 11, 1.5, False)),
           image, gt)
    ib = 3 * HEIGHT * WIDTH * 4
    print(f"  bytes: fwd ~{(2*ib + 3*ib + 2*ib + 5*ib)/1e6:.0f} MB "
          f"(read x,y + write/read 3 blur planes + stats read + map math) "
          f"-> ~{(2*ib + 3*ib + 2*ib + 5*ib)/gbps/1e6:.2f} ms floor; "
          f"bwd ~{(3*ib*2 + 3*ib + 2*ib)/1e6:.0f} MB "
          f"-> ~{(3*ib*2 + 3*ib + 2*ib)/gbps/1e6:.2f} ms floor")


if __name__ == "__main__":
    main()
