"""On-chip end-to-end quality run of the full LightGaussian pipeline.

Builds a synthetic multi-view dataset (gt images are renders of a random
Gaussian scene), then drives the real CLIs on the actual device backend:

  train_densify_prune -> prune_finetune (GSS 0.6) -> distill_train (SH 3->2)
  -> vectree VQ (0.6) -> render_sets --load_vq

and reports test PSNR/SSIM + checkpoint size after every stage, mirroring the
reference's Table-5 progression (BASELINE.md): prune and distill should cost
~0 PSNR on this synthetic scene while shrinking the checkpoint.

Writes the stage table to E2E_TPU.md at the repo root.

Usage: python scripts/e2e_quality.py [--preset small|large]
(small ~25 min warm; large ~1-2 h incl. remote compiles)
"""
import argparse
import json
import shutil
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from lightgaussian_tpu.data import ply as ply_mod
from lightgaussian_tpu.models.camera import Camera
from lightgaussian_tpu.ops.rasterize import render
from lightgaussian_tpu.render.poses import c2w_from_camera
from lightgaussian_tpu.utils.synthetic import random_scene

_p = argparse.ArgumentParser()
_p.add_argument("--preset", choices=["small", "large"], default="small")
_ARGS = _p.parse_args()

OUT = Path(f"/tmp/e2e_scene_{_ARGS.preset}")
MODEL = Path(f"/tmp/e2e_model_{_ARGS.preset}")
FOVX = 0.9
if _ARGS.preset == "large":
    W = H = 256
    N_TARGET = 8000
    N_VIEWS = 24
    TRAIN_ITERS = 2000
    PRUNE_END = 2600
    DISTILL_END = 3200
    DENSIFY_UNTIL = 1200
    CODEBOOK = 1024
else:
    W = H = 128
    N_TARGET = 3000
    N_VIEWS = 16
    TRAIN_ITERS = 800
    PRUNE_END = 1100
    DISTILL_END = 1400
    DENSIFY_UNTIL = 500
    CODEBOOK = 256


def make_dataset():
    shutil.rmtree(OUT, ignore_errors=True)
    for p in [MODEL, Path(str(MODEL) + "_pf"), Path(str(MODEL) + "_distill")]:
        shutil.rmtree(p, ignore_errors=True)
    (OUT / "train").mkdir(parents=True)
    (OUT / "test").mkdir(parents=True)

    target = random_scene(
        n=N_TARGET, seed=7, max_sh_degree=3, active_sh_degree=3,
        scale_range=(0.02, 0.08), extent=1.6,
    )
    from PIL import Image

    def dump(split, n, ang0, elev):
        frames = []
        for i in range(n):
            ang = ang0 + i * (2 * np.pi / n)
            eye = [3.0 * np.sin(ang), elev, -3.0 * np.cos(ang)]
            cam = Camera.look_at(eye=eye, target=[0, 0, 0], width=W, height=H, fovx=FOVX)
            img = render(target, cam, jnp.zeros((3,)), method="tiled",
                         max_instances=524288).render
            arr = np.clip(np.asarray(img).transpose(1, 2, 0) * 255, 0, 255).astype(np.uint8)
            name = f"{split}/r_{i}"
            Image.fromarray(arr).save(OUT / f"{name}.png")
            c2w = c2w_from_camera(cam, blender=True)
            frames.append({"file_path": f"./{name}", "transform_matrix": c2w.tolist()})
        meta = {"camera_angle_x": FOVX, "frames": frames}
        (OUT / f"transforms_{split}.json").write_text(json.dumps(meta))

    dump("train", N_VIEWS, 0.0, 0.5)
    dump("test", 4, 0.19, 0.7)

    # Seed points: subsampled target means (skips the 100k random init).
    idx = np.random.default_rng(0).choice(N_TARGET, N_TARGET // 2, replace=False)
    pts = np.asarray(target.means)[idx]
    cols = np.full((len(idx), 3), 0.5, np.float32)
    ply_mod.store_point_cloud(OUT / "points3d.ply", pts, cols)
    print("dataset written", flush=True)


def test_psnr(model_dir: Path, which: str = "latest") -> dict:
    res = json.loads((model_dir / "results.json").read_text())
    key = sorted(res)[-1] if which == "latest" else which
    return res[key]


def ply_mb(p: Path) -> float:
    return p.stat().st_size / 1e6


def main():
    make_dataset()
    from lightgaussian_tpu.cli import (
        train_densify_prune, prune_finetune, distill_train,
        render_sets, metrics, vectree,
    )

    stages = []

    # ---- Stage 1: train with densification ------------------------------
    train_densify_prune.main([
        "-s", str(OUT), "-m", str(MODEL),
        "--iterations", str(TRAIN_ITERS), "--eval",
        "--test_iterations", "1", str(TRAIN_ITERS),
        "--save_iterations", str(TRAIN_ITERS),
        "--checkpoint_iterations", str(TRAIN_ITERS),
        "--densify_from_iter", "100", "--densification_interval", "100",
        "--densify_until_iter", str(DENSIFY_UNTIL),
        "--opacity_reset_interval", "10000",
        "--position_lr_max_steps", str(TRAIN_ITERS),
    ])
    render_sets.main(["-s", str(OUT), "-m", str(MODEL),
                      "--iteration", str(TRAIN_ITERS), "--eval", "--skip_train"])
    metrics.main(["-m", str(MODEL)])
    raw_ply = MODEL / f"point_cloud/iteration_{TRAIN_ITERS}/point_cloud.ply"
    m = test_psnr(MODEL)
    stages.append(("3D-GS train (densify)", m, ply_mb(raw_ply)))
    print("STAGE train:", m, flush=True)

    # ---- Stage 2: GSS prune 0.6 + recovery finetune ----------------------
    pf = Path(str(MODEL) + "_pf")
    prune_finetune.main([
        "-s", str(OUT), "-m", str(pf),
        "--start_checkpoint", str(MODEL / f"chkpnt{TRAIN_ITERS}.npz"),
        "--iterations", str(PRUNE_END),
        "--prune_iterations", str(TRAIN_ITERS + 5),
        "--prune_percent", "0.6", "--prune_type", "v_important_score",
        "--eval", "--test_iterations", str(PRUNE_END),
        "--save_iterations", str(PRUNE_END),
        "--checkpoint_iterations", str(PRUNE_END),
    ])
    render_sets.main(["-s", str(OUT), "-m", str(pf),
                      "--iteration", str(PRUNE_END), "--eval", "--skip_train"])
    metrics.main(["-m", str(pf)])
    pf_ply = pf / f"point_cloud/iteration_{PRUNE_END}/point_cloud.ply"
    m = test_psnr(pf)
    stages.append(("+ GSS prune 60% + finetune", m, ply_mb(pf_ply)))
    print("STAGE prune:", m, flush=True)

    # ---- Stage 3: SH distillation 3 -> 2 ---------------------------------
    dl = Path(str(MODEL) + "_distill")
    distill_train.main([
        "-s", str(OUT), "-m", str(dl),
        "--start_checkpoint", str(pf / f"chkpnt{PRUNE_END}.npz"),
        "--new_max_sh", "2", "--augmented_view",
        "--iteration_base", str(PRUNE_END),
        "--iterations_total", str(DISTILL_END),
        "--test_iterations", str(DISTILL_END),
        "--save_iterations", str(DISTILL_END),
        "--checkpoint_iterations", str(DISTILL_END),
        "--eval",
    ])
    render_sets.main(["-s", str(OUT), "-m", str(dl),
                      "--iteration", str(DISTILL_END), "--eval", "--skip_train"])
    metrics.main(["-m", str(dl)])
    dl_ply = dl / f"point_cloud/iteration_{DISTILL_END}/point_cloud.ply"
    m = test_psnr(dl)
    stages.append(("+ SH distill deg 3->2", m, ply_mb(dl_ply)))
    print("STAGE distill:", m, flush=True)

    # ---- Stage 4: VecTree VQ 0.6 -----------------------------------------
    vq_dir = dl / f"point_cloud/iteration_{DISTILL_END + 1}"
    vectree.main([
        "--important_score_npz_path", str(dl / "imp_score.npz"),
        "--input_path", str(dl_ply),
        "--save_path", str(vq_dir),
        "--vq_ratio", "0.6", "--codebook_size", str(CODEBOOK),
        "--iteration_num", "300",
    ])
    render_sets.main(["-s", str(OUT), "-m", str(dl),
                      "--iteration", str(DISTILL_END + 1), "--eval",
                      "--skip_train", "--load_vq"])
    metrics.main(["-m", str(dl)])
    zip_path = vq_dir / "extreme_saving.zip"  # written by quantize_scene
    m = test_psnr(dl, which="latest")
    stages.append(("+ VecTree VQ 60%", m, zip_path.stat().st_size / 1e6))
    print("STAGE vq:", m, flush=True)

    # ---- Report -----------------------------------------------------------
    lines = [
        "# End-to-end quality run on TPU (synthetic scene)",
        "",
        f"Dataset: {N_TARGET}-Gaussian synthetic scene, {N_VIEWS} train / 4 test views at "
        f"{W}x{H}; full pipeline driven through the real CLIs on one TPU chip "
        "(no interpret mode). Mirrors the reference's Table-5 stage progression "
        "(BASELINE.md).",
        "",
        "| Stage | PSNR | SSIM | LPIPS* | ckpt MB |",
        "|---|---|---|---|---|",
    ]
    for name, m, mb in stages:
        lines.append(
            f"| {name} | {m['PSNR']:.2f} | {m['SSIM']:.4f} | {m['LPIPS']:.4f} | {mb:.2f} |"
        )
    first_mb, last_mb = stages[0][2], stages[-1][2]
    lines += [
        "",
        "*LPIPS kind: vgg-random (no pretrained weights on this box) — "
        "relative ordering only, not comparable to published LPIPS values.",
    ]
    lines += ["", f"Compression: {first_mb:.2f} MB -> {last_mb:.2f} MB "
              f"(**{first_mb / max(last_mb, 1e-9):.1f}x**), "
              f"PSNR {stages[0][1]['PSNR']:.2f} -> {stages[-1][1]['PSNR']:.2f} dB.", ""]
    (REPO / ("E2E_TPU.md" if _ARGS.preset == "small" else f"E2E_TPU_{_ARGS.preset}.md")).write_text("\n".join(lines))
    print("\n".join(lines), flush=True)
    print("E2E QUALITY: ALL OK", flush=True)


if __name__ == "__main__":
    main()
