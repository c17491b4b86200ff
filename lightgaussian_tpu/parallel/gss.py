"""Camera-parallel Global Significance Score accumulation.

The reference's `prune_list` (`/root/reference/prune.py:133-157`) iterates
EVERY training camera through the counting renderer and sums per-Gaussian
(hit_count, important_score) — the most camera-parallel pass in the whole
pipeline. `train/gss.py:accumulate_gss` is its sequential single-chip
equivalent; this module is the mesh program: cameras are sharded over the
``data`` axis, each shard scans its local slice through the counting
renderer, and the per-Gaussian accumulators are ``psum``'d over the axis —
the SURVEY §7 Stage-2 "psum of per-Gaussian accumulators" pattern. The
result is replicated and bit-comparable (up to f32 regrouping of the
per-camera sums) with the sequential loop; equivalence is gated in
tests/test_parallel.py.
"""
from __future__ import annotations

import functools
from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lightgaussian_tpu.models.camera import Camera, index_camera, stack_cameras
from lightgaussian_tpu.models.gaussians import GaussianScene
from lightgaussian_tpu.ops.rasterize import count_render
from lightgaussian_tpu.parallel.mesh import DATA_AXIS


def pad_cameras(cams: Sequence[Camera], multiple: int):
    """Stack cameras padded (by repeating the first) to a length that is a
    `multiple`; returns (stacked Camera, weights [M_pad] f32 with 0.0 on
    padding entries)."""
    cams = list(cams)
    m = len(cams)
    assert m > 0, "no cameras to accumulate over"
    m_pad = -(-m // multiple) * multiple
    padded = cams + [cams[0]] * (m_pad - m)
    w = jnp.asarray([1.0] * m + [0.0] * (m_pad - m), jnp.float32)
    return stack_cameras(padded), w


@functools.lru_cache(maxsize=None)
def make_accumulate_gss_sharded(
    mesh,
    max_instances: int,
    cams_per_shard: int,
    interpret: bool = False,
    axis: str = DATA_AXIS,
):
    """Build the jitted sharded sweep: (scene, camera_batch, weights, bg) ->
    (counts [CAP] int, imp [CAP] f32), summed over every weight-1 camera.

    `camera_batch`/`weights` have leading dim mesh.shape[axis] * cams_per_shard
    (use `pad_cameras`). The factory is lru_cached on its (hashable) arguments
    so repeated sweeps reuse one jit object — a fresh jit closure per call
    would retrace (and on remote-compile setups recompile) the counting
    renderer on every GSS prune, the exact cost `train/gss._count_one`
    caches against on the sequential path.
    """

    def shard_sweep(scene: GaussianScene, cams: Camera, w, bg):
        def body(i, acc):
            counts, imp = acc
            out = count_render(
                scene, index_camera(cams, i), bg,
                max_instances=max_instances, interpret=interpret,
            )
            live = w[i] > 0.0
            counts = counts + jnp.where(live, out.gaussians_count, 0)
            imp = imp + jnp.where(live, out.important_score, 0.0)
            return counts, imp

        # dtype matches the sequential accumulate_gss so auto-dispatch is
        # transparent (int64 under x64, else int32)
        cdtype = jnp.int64 if jax.config.x64_enabled else jnp.int32
        counts0 = jnp.zeros((scene.capacity,), cdtype)
        imp0 = jnp.zeros((scene.capacity,), jnp.float32)
        counts, imp = jax.lax.fori_loop(0, cams_per_shard, body, (counts0, imp0))
        return (
            jax.lax.psum(counts, axis),
            jax.lax.psum(imp, axis),
        )

    sharded = jax.shard_map(
        shard_sweep,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        # Replicated over `axis` by the psum; any other mesh axes never enter
        # the computation, so the outputs are replicated over them too.
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def accumulate_gss_sharded(
    mesh,
    scene: GaussianScene,
    cameras: Iterable[Camera],
    bg,
    max_instances: int,
    interpret: bool = False,
    axis: str = DATA_AXIS,
):
    """Camera-parallel `accumulate_gss`: shard `cameras` over `mesh`'s `axis`,
    sweep locally, psum the per-Gaussian (count, imp) accumulators."""
    n_shards = mesh.shape[axis]
    batch, w = pad_cameras(list(cameras), n_shards)
    m_pad = int(w.shape[0])
    # Block-partition (shard s gets cameras [s*k, (s+1)*k)): matches P(axis)
    # sharding of the stacked leading dim.
    sweep = make_accumulate_gss_sharded(
        mesh, int(max_instances), m_pad // n_shards, bool(interpret), axis
    )
    return sweep(scene, batch, w, bg)
