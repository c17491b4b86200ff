"""TrainState: scene + optimizer + densification statistics as one pytree.

The densification stats mirror `GaussianModel.max_radii2D / xyz_gradient_accum
/ denom` (`/root/reference/scene/gaussian_model.py:173-177,784-788`), kept at
fixed capacity alongside the scene."""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lightgaussian_tpu.models.gaussians import GaussianScene
from lightgaussian_tpu.train.optim import AdamState, init_adam


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrainState:
    scene: GaussianScene
    opt: AdamState
    step: jnp.ndarray  # scalar int32
    max_radii2d: jnp.ndarray  # [cap] f32
    xyz_grad_accum: jnp.ndarray  # [cap] f32
    denom: jnp.ndarray  # [cap] f32

    @property
    def capacity(self) -> int:
        return self.scene.capacity


def init_train_state(scene: GaussianScene) -> TrainState:
    cap = scene.capacity
    return TrainState(
        scene=scene,
        opt=init_adam(scene.params()),
        step=jnp.int32(0),
        max_radii2d=jnp.zeros((cap,), jnp.float32),
        xyz_grad_accum=jnp.zeros((cap,), jnp.float32),
        denom=jnp.zeros((cap,), jnp.float32),
    )


def grow_capacity(state: TrainState, new_capacity: int) -> TrainState:
    """Reallocate every per-Gaussian array to a larger capacity (outside jit;
    triggers one recompile of the jitted fns — rare, on densify overflow)."""
    old = state.scene.capacity
    assert new_capacity > old

    def grow(x):
        if x.ndim >= 1 and x.shape[0] == old:
            pad = [(0, new_capacity - old)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad)
        return x

    return jax.tree.map(grow, state)
