"""Observability: output-dir preparation, TensorBoard scalars, metric.csv.

The TPU build of `/root/reference/utils/logger_utils.py`: `prepare_output_dir`
creates the model dir (uuid fallback) and persists the config (as JSON, not the
reference's eval()-able `cfg_args` repr); `MetricsLogger` owns a TensorBoard
writer (optional) plus the append-only `metric.csv` with the reference's
column set `iteration,set,l1_loss,psnr,ssim,lpips,file_size,elapsed`
(`logger_utils.py:65-75,166-179`); `training_report` renders the full test set
at test iterations and logs image metrics.
"""
from __future__ import annotations

import csv
import dataclasses
import json
import time
import uuid
from pathlib import Path

import jax.numpy as jnp
import numpy as np

# The reference's column set (`logger_utils.py:65-75`) + `lpips_kind`: scores
# from the seeded-random-VGG fallback (no pretrained weights on the box) are
# NOT comparable to published LPIPS and must never masquerade as such.
CSV_FIELDS = ["iteration", "set", "l1_loss", "psnr", "ssim", "lpips",
              "lpips_kind", "file_size", "elapsed"]


def prepare_output_dir(model_path: str | None, cfg=None) -> Path:
    """`prepare_output_and_logger` dir logic (`logger_utils.py:22-42`)."""
    if not model_path:
        model_path = f"./output/{str(uuid.uuid4())[:10]}"
    out = Path(model_path)
    out.mkdir(parents=True, exist_ok=True)
    if cfg is not None:
        payload = dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg) else dict(cfg)
        (out / "cfg_args.json").write_text(json.dumps(payload, indent=2, default=str))
    print(f"Output folder: {out}")
    return out


class MetricsLogger:
    """TensorBoard scalars (if available) + metric.csv appends."""

    def __init__(self, model_path: str | Path, enable_tensorboard: bool = True):
        self.model_path = Path(model_path)
        self.csv_path = self.model_path / "metric.csv"
        self.tb = None
        if enable_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(str(self.model_path))
            except Exception:
                print("[logging] TensorBoard unavailable; scalars go to metric.csv only")
        if self.csv_path.exists():
            # Schema migration: resuming into a model dir whose metric.csv
            # predates a column change must not append rows that silently
            # misalign with the old header — park the old file instead.
            with open(self.csv_path, newline="") as f:
                header = next(csv.reader(f), [])
            if header != CSV_FIELDS:
                legacy = self.csv_path.with_name("metric_legacy.csv")
                self.csv_path.rename(legacy)
                print(f"[logging] metric.csv schema changed; old rows moved to {legacy.name}")
        if not self.csv_path.exists():
            with open(self.csv_path, "w", newline="") as f:
                csv.writer(f).writerow(CSV_FIELDS)

    def scalar(self, tag: str, value, step: int) -> None:
        if self.tb is not None:
            self.tb.add_scalar(tag, float(value), int(step))

    def image(self, tag: str, img, step: int) -> None:
        if self.tb is not None:
            self.tb.add_image(tag, np.asarray(jnp.clip(img, 0, 1)), int(step))

    def csv_row(self, iteration: int, set_name: str, l1: float, psnr: float,
                ssim: float, lpips: float, file_size_mb: float, elapsed_s: float,
                lpips_kind: str = "vgg-random") -> None:
        with open(self.csv_path, "a", newline="") as f:
            csv.writer(f).writerow(
                [iteration, set_name, f"{l1:.6f}", f"{psnr:.4f}", f"{ssim:.6f}",
                 f"{lpips:.6f}", lpips_kind, f"{file_size_mb:.3f}", f"{elapsed_s:.2f}"]
            )

    def close(self) -> None:
        if self.tb is not None:
            self.tb.close()


def file_size_mb(path: str | Path) -> float:
    p = Path(path)
    return p.stat().st_size / 1024.0 / 1024.0 if p.exists() else 0.0


def training_report(
    logger: MetricsLogger,
    iteration: int,
    scene_state,
    eval_render_fn,
    test_cameras: list,
    train_cameras_sample: list,
    bg,
    elapsed_s: float,
    ckpt_path: str | Path | None = None,
    lpips_params=None,
    log_images: bool = False,
) -> dict:
    """Full test-split evaluation at a test iteration (`logger_utils.py:
    45-189`): renders every test camera (and a train sample), logs L1/PSNR/
    SSIM/LPIPS to TB + metric.csv incl. checkpoint size."""
    from lightgaussian_tpu.eval.lpips import get_lpips_params, lpips as lpips_fn
    from lightgaussian_tpu.ops import losses

    lpips_params = lpips_params or get_lpips_params()
    results = {}
    size_mb = file_size_mb(ckpt_path) if ckpt_path else 0.0

    for set_name, cams in (("test", test_cameras), ("train", train_cameras_sample)):
        if not cams:
            continue
        l1s, psnrs, ssims, lpipss = [], [], [], []
        for idx, cam in enumerate(cams):
            img = eval_render_fn(scene_state, cam, bg)
            if isinstance(img, tuple):
                img = img[0]
            img = jnp.clip(img, 0.0, 1.0)
            gt = jnp.clip(cam.gt_image, 0.0, 1.0)
            l1s.append(float(losses.l1_loss(img, gt)))
            psnrs.append(float(losses.psnr(img, gt)))
            ssims.append(float(losses.ssim(img, gt)))
            lpipss.append(float(lpips_fn(lpips_params, img, gt)))
            if log_images and idx < 5:
                logger.image(f"{set_name}_view_{idx}/render", img, iteration)
        row = {
            "l1": float(np.mean(l1s)),
            "psnr": float(np.mean(psnrs)),
            "ssim": float(np.mean(ssims)),
            "lpips": float(np.mean(lpipss)),
        }
        results[set_name] = row
        print(
            f"[ITER {iteration}] Evaluating {set_name}: L1 {row['l1']:.5f} "
            f"PSNR {row['psnr']:.3f} SSIM {row['ssim']:.4f} LPIPS {row['lpips']:.4f}"
        )
        for k, v in row.items():
            logger.scalar(f"{set_name}/loss_viewpoint - {k}", v, iteration)
        logger.csv_row(iteration, set_name, row["l1"], row["psnr"], row["ssim"],
                       row["lpips"], size_mb, elapsed_s,
                       lpips_kind=lpips_params.kind)
    return results


class StepTimer:
    """Training wall-time accumulator — the TPU stand-in for the reference's
    paired cuda events (`train_densify_prune.py:66-67,108,141`).

    Two usage styles:
    - synchronous loops: `start()` before / `stop()` after the blocked step;
    - async-dispatch loops (train/loop.py): `resume()` when entering a
      training section and `pause()` around excluded sections (eval renders,
      checkpoint saves, viewer polling) — per-step host timing is meaningless
      when the device works through a queue, so the honest quantity is wall
      time spent in the training sections."""

    def __init__(self):
        self.total = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.total += dt
        self._t0 = None
        return dt

    def resume(self):
        if self._t0 is None:
            self._t0 = time.perf_counter()

    def pause(self):
        if self._t0 is not None:
            self.stop()
