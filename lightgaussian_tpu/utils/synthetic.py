"""Synthetic scene generation for tests and benchmarks (BASELINE.json config[0]:
~1k-Gaussian random scene rendered at small resolution, CPU-checkable)."""
from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from lightgaussian_tpu.models.camera import Camera
from lightgaussian_tpu.models.gaussians import GaussianScene, empty_scene
from lightgaussian_tpu.ops import sh as sh_ops


def random_scene(
    n: int = 512,
    seed: int = 0,
    max_sh_degree: int = 3,
    active_sh_degree: int | None = None,
    capacity: int | None = None,
    extent: float = 1.0,
    scale_range=(0.01, 0.08),
) -> GaussianScene:
    rng = np.random.default_rng(seed)
    cap = n if capacity is None else capacity
    scene = empty_scene(cap, max_sh_degree)
    k_rest = sh_ops.num_sh_coeffs(max_sh_degree) - 1
    means = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    sh_dc = rng.normal(0.0, 0.5, (n, 3)).astype(np.float32)
    sh_rest = rng.normal(0.0, 0.05, (n, k_rest, 3)).astype(np.float32)
    log_scales = np.log(rng.uniform(*scale_range, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opa = rng.uniform(-1.0, 3.0, (n,)).astype(np.float32)

    def fill(buf, vals):
        return buf.at[: vals.shape[0]].set(jnp.asarray(vals))

    return dataclasses.replace(
        scene,
        means=fill(scene.means, means),
        sh_dc=fill(scene.sh_dc, sh_dc),
        sh_rest=fill(scene.sh_rest, sh_rest),
        log_scales=fill(scene.log_scales, log_scales),
        quats=fill(scene.quats, quats),
        opacity_logits=fill(scene.opacity_logits, opa),
        alive=scene.alive.at[:n].set(True),
        active_sh_degree=(
            max_sh_degree if active_sh_degree is None else active_sh_degree
        ),
    )


def default_camera(width: int = 96, height: int = 64, dist: float = 4.0) -> Camera:
    return Camera.look_at(
        eye=[0.3, -0.2, -dist], target=[0.0, 0.0, 0.0], width=width, height=height
    )
