"""Global Significance Score (GSS) pruning — the heart of LightGaussian's
compression (`/root/reference/prune.py:112-157`).

`accumulate_gss` sweeps every training camera with the counting renderer and
sums each Gaussian's blending contribution (alpha * transmittance over all
rays) and hit count; `calculate_v_imp_score` scales by normalized volume^v_pow;
`prune_percentile` drops the bottom `percent` fraction — all as jitted array
passes over the fixed-capacity scene."""
from __future__ import annotations

import functools
from typing import Iterable

import jax
import jax.numpy as jnp

from lightgaussian_tpu.models.camera import Camera
from lightgaussian_tpu.models.gaussians import GaussianScene
from lightgaussian_tpu.ops.rasterize import count_render


@functools.lru_cache(maxsize=None)
def _count_one(max_instances: int, interpret: bool):
    # Module-level jit cache: a fresh @jax.jit closure per accumulate_gss call
    # would retrace (and on remote-compile setups recompile) the counting
    # renderer on every GSS prune / imp-score export.
    @jax.jit
    def one(scene, camera, bg):
        out = count_render(scene, camera, bg, max_instances=max_instances, interpret=interpret)
        return out.gaussians_count, out.important_score

    return one


def accumulate_gss(scene: GaussianScene, cameras: Iterable[Camera], bg, max_instances: int, interpret: bool = False):
    """Sum per-Gaussian (hit_count, important_score) over all cameras
    (`prune.py:133-157`). Python loop over cameras, jitted per-camera pass."""
    one = _count_one(int(max_instances), bool(interpret))
    counts = jnp.zeros((scene.capacity,), jnp.int64 if jax.config.x64_enabled else jnp.int32)
    imp = jnp.zeros((scene.capacity,), jnp.float32)
    for cam in cameras:
        c, s = one(scene, cam, bg)
        counts = counts + c
        imp = imp + s
    return counts, imp


def accumulate_gss_auto(scene: GaussianScene, cameras: Iterable[Camera], bg, max_instances: int, interpret: bool = False):
    """`accumulate_gss`, camera-parallel over the `data` mesh axis when more
    than one device is visible (parallel/gss.py — psum of the per-Gaussian
    accumulators; equivalence vs the sequential loop gated in
    tests/test_parallel.py), sequential on one chip."""
    # Counting renders never touch the gt; drop the cached SSIM moment planes
    # some loops attach so the sharded path doesn't stack/ship them.
    cameras = [
        c.with_gt_ssim_stats(None) if c.gt_ssim_stats is not None else c
        for c in cameras
    ]
    if len(jax.devices()) > 1 and len(cameras) > 1:
        from lightgaussian_tpu.parallel.gss import accumulate_gss_sharded
        from lightgaussian_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=len(jax.devices()), space=1)
        return accumulate_gss_sharded(
            mesh, scene, cameras, bg, max_instances, interpret=interpret
        )
    return accumulate_gss(scene, cameras, bg, max_instances, interpret)


@jax.jit
def calculate_v_imp_score(scene: GaussianScene, imp_list: jnp.ndarray, v_pow: float):
    """(volume / 90th-largest-percentile volume)^v_pow * imp (`prune.py:112-128`),
    computed over alive Gaussians only."""
    volume = jnp.prod(scene.scales, axis=1)
    masked = jnp.where(scene.alive, volume, -jnp.inf)
    sorted_desc = -jnp.sort(-masked)
    n_alive = scene.alive.sum()
    index = (0.9 * n_alive).astype(jnp.int32)
    kth_percent_largest = sorted_desc[jnp.minimum(index, scene.capacity - 1)]
    v_list = jnp.power(volume / kth_percent_largest, v_pow) * imp_list
    return jnp.where(scene.alive, v_list, 0.0)


@jax.jit
def percentile_keep_mask(scene: GaussianScene, scores: jnp.ndarray, percent: jnp.ndarray):
    """keep = score > value at the `percent` quantile among alive
    (`gaussian_model.py:763-782` semantics: prune <= threshold)."""
    masked = jnp.where(scene.alive, scores, jnp.inf)
    sorted_asc = jnp.sort(masked)
    n_alive = scene.alive.sum()
    idx = jnp.clip((percent * n_alive).astype(jnp.int32), 0, scene.capacity - 1)
    threshold = sorted_asc[idx]
    return scores > threshold
