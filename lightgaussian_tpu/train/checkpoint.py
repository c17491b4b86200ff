"""Training checkpoints: full TrainState (+iteration) to a single .npz.

The TPU analogue of `torch.save((gaussians.capture(), iteration), chkpntN.pth)`
(`/root/reference/scene/gaussian_model.py:62-96`, save sites
`train_densify_prune.py:214-221`): parameters, optimizer moments, densification
statistics, step counter, and SH-degree metadata all round-trip. Stored as
flattened pytree leaves keyed by their tree paths — self-describing and
framework-portable (plain numpy arrays).
"""
from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np

from lightgaussian_tpu.models.gaussians import GaussianScene, empty_scene
from lightgaussian_tpu.train.state import TrainState, init_train_state


def _leaf_key(path) -> str:
    return "/".join(str(getattr(p, "name", getattr(p, "key", getattr(p, "idx", p)))) for p in path)


def save_checkpoint(path: str | Path, state: TrainState, iteration: int, spatial_lr_scale: float = 1.0) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves_with_paths, _ = jax.tree_util.tree_flatten_with_path(state)
    arrays = {_leaf_key(p): np.asarray(v) for p, v in leaves_with_paths}
    scene = state.scene
    meta = {
        "iteration": int(iteration),
        "capacity": scene.capacity,
        "active_sh_degree": scene.active_sh_degree,
        "max_sh_degree": scene.max_sh_degree,
        "spatial_lr_scale": float(spatial_lr_scale),
        "format_version": 1,
    }
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def load_checkpoint(path: str | Path) -> tuple[TrainState, int, float]:
    """Returns (state, iteration, spatial_lr_scale)."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        arrays = {k: z[k] for k in z.files if k != "__meta__"}

    template_scene = empty_scene(
        meta["capacity"],
        max_sh_degree=meta["max_sh_degree"],
        active_sh_degree=meta["active_sh_degree"],
    )
    template = init_train_state(template_scene)
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, tmpl in leaves_with_paths:
        key = _leaf_key(p)
        if key not in arrays:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = arrays[key]
        if tuple(arr.shape) != tuple(np.shape(tmpl)):
            raise ValueError(f"checkpoint leaf {key} shape {arr.shape} != expected {np.shape(tmpl)}")
        leaves.append(jax.numpy.asarray(arr, dtype=np.asarray(tmpl).dtype))
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, meta["iteration"], meta["spatial_lr_scale"]
