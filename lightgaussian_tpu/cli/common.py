"""Shared CLI plumbing: dataclass-backed argument groups.

The TPU build's answer to the reference's reflection-based `ParamGroup`
(`/root/reference/arguments/__init__.py:21-98`): every field of the config
dataclasses becomes a `--flag` with its default; `get_combined_args` merges a
saved `cfg_args.json` from the model dir with CLI overrides (the reference
eval()s a repr'd Namespace — we parse JSON)."""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
from pathlib import Path
from typing import get_args, get_origin, get_type_hints

from lightgaussian_tpu.config import ModelParams, OptimizationParams, PipelineParams


def add_dataclass_args(parser: argparse.ArgumentParser, cls, prefix: str = "", shorthand: dict | None = None) -> None:
    shorthand = shorthand or {}
    hints = get_type_hints(cls)
    for f in dataclasses.fields(cls):
        name = f.name
        flag = f"--{prefix}{name}"
        names = [flag]
        if name in shorthand:
            names.append(f"-{shorthand[name]}")
        t = hints.get(name, str)
        default = f.default if f.default is not dataclasses.MISSING else (
            f.default_factory() if f.default_factory is not dataclasses.MISSING else None
        )
        if t is bool:
            parser.add_argument(*names, action="store_true", default=default)
        elif get_origin(t) is list or t in (list,):
            inner = (get_args(t) or (int,))[0]
            parser.add_argument(*names, nargs="+", type=inner, default=default)
        elif t in (int, float, str):
            parser.add_argument(*names, type=t, default=default)
        else:
            parser.add_argument(*names, type=str, default=default)


def extract_dataclass(args: argparse.Namespace, cls, prefix: str = ""):
    kwargs = {}
    for f in dataclasses.fields(cls):
        key = f"{prefix}{f.name}"
        if hasattr(args, key):
            kwargs[f.name] = getattr(args, key)
    return cls(**kwargs)


# the reference gives these single-letter shorthands (arguments/__init__.py:54-69)
MODEL_SHORTHAND = {"source_path": "s", "model_path": "m", "images": "i", "resolution": "r", "white_background": "w"}


def add_standard_groups(parser: argparse.ArgumentParser, opt: bool = True) -> None:
    add_dataclass_args(parser, ModelParams, shorthand=MODEL_SHORTHAND)
    add_dataclass_args(parser, PipelineParams)
    if opt:
        add_dataclass_args(parser, OptimizationParams)


def extract_standard(args: argparse.Namespace, opt: bool = True):
    model = extract_dataclass(args, ModelParams)
    pipeline = extract_dataclass(args, PipelineParams)
    optp = extract_dataclass(args, OptimizationParams) if opt else OptimizationParams()
    return model, pipeline, optp


def get_combined_args(parser: argparse.ArgumentParser, argv=None) -> argparse.Namespace:
    """Merge saved training config with CLI args for render/eval tools
    (`arguments/__init__.py:101-121`): values present in the model dir's
    cfg_args.json override argparse defaults; explicit CLI flags win."""
    args = parser.parse_args(argv)
    cfg_path = Path(getattr(args, "model_path", "") or "") / "cfg_args.json"
    if cfg_path.exists():
        saved = json.loads(cfg_path.read_text())
        flat = {}
        for group in ("model", "pipeline", "opt"):
            if isinstance(saved.get(group), dict):
                flat.update(saved[group])
        flat.update({k: v for k, v in saved.items() if not isinstance(v, dict)})
        defaults = parser.parse_args([] if argv is None else [])
        for k, v in flat.items():
            if hasattr(args, k) and getattr(args, k) == getattr(defaults, k, None):
                setattr(args, k, v)
    return args


def enable_compile_cache() -> None:
    """Enable JAX's persistent compilation cache for CLI runs.

    Training recompiles on capacity growth (instance buffer / Gaussian slots),
    and on a remote-compile setup each such compile costs tens of seconds —
    cached, a repeat run (or the same capacity reached again) loads instantly.
    Called explicitly from every CLI ``main()`` (never at import time, so
    library imports don't mutate global JAX config). Opt out or relocate with
    $JAX_COMPILATION_CACHE_DIR (empty string disables).
    """
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_compile_cache")
    )
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def add_debug_nans_flag(parser: argparse.ArgumentParser) -> None:
    """`--debug_nans` — the TPU analogue of the reference's `--detect_anomaly`
    (`/root/reference/train_densify_prune.py:237,267`): re-runs the op that
    produced a NaN un-jitted and raises with a stack trace."""
    parser.add_argument(
        "--debug_nans", action="store_true",
        help="enable jax_debug_nans: fail loudly at the op that produced a NaN",
    )


def add_cache_gt_ssim_flag(parser: argparse.ArgumentParser) -> None:
    """Tri-state control of the per-camera GT SSIM moment cache
    (`train/loop.py:_attach_gt_ssim_stats`; default auto = on within the
    4 GiB budget)."""
    g = parser.add_mutually_exclusive_group()
    g.add_argument(
        "--cache_gt_ssim", dest="cache_gt_ssim", action="store_true",
        default=None,
        help="force-enable the per-camera GT SSIM moment cache (+3%% step "
             "throughput, ~12 MB/camera at 1080p; default: auto by memory)",
    )
    g.add_argument(
        "--no_cache_gt_ssim", dest="cache_gt_ssim", action="store_false",
        help="disable the GT SSIM moment cache",
    )


def apply_debug_flags(args: argparse.Namespace) -> None:
    if getattr(args, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)


def interpret_default() -> bool:
    """Pallas interpret mode is required off-TPU (CPU test/dev runs)."""
    import jax

    return jax.devices()[0].platform == "cpu"
