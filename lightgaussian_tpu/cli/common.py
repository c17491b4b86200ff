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


def interpret_default() -> bool:
    """Pallas interpret mode is required off-TPU (CPU test/dev runs)."""
    import jax

    return jax.devices()[0].platform == "cpu"
