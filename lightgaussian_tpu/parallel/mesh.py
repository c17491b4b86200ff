"""Device-mesh construction for multi-chip training.

The reference is single-GPU (`SURVEY.md` §2.3); the TPU-native scaling story is
a 2D mesh:

- ``data``  — camera-batch data parallelism (one camera per data-shard per
  step; parameter gradients are psum'd over this axis — across hosts this axis
  rides DCN).
- ``space`` — spatial parallelism over the image's tile-row strips of ONE
  camera (the 3D-GS analogue of sequence/context parallelism): each chip blends
  a horizontal strip, the image is reassembled with an ``all_gather`` whose VJP
  scatters pixel gradients back to the owning strip; parameter gradients are
  psum'd over this axis too (rides ICI).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(data: int | None = None, space: int = 1, devices=None) -> Mesh:
    """Build a (data, space) mesh. With defaults, uses every visible device on
    the data axis."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if data is None:
        assert n % space == 0, f"{n} devices not divisible by space={space}"
        data = n // space
    assert data * space <= n, f"mesh {data}x{space} > {n} devices"
    grid = np.asarray(devices[: data * space]).reshape(data, space)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))
