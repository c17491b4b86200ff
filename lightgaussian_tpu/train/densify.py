"""Densification (clone/split), pruning, and opacity reset — as masked,
fixed-capacity array passes.

Reference semantics: `densify_and_prune` (`/root/reference/scene/
gaussian_model.py:636-782`): Gaussians whose accumulated screen-space
positional gradient exceeds `max_grad` are cloned (if small: max scale <=
percent_dense * extent) or split into two samples drawn from the Gaussian
with scales shrunk by 1/(0.8*2) (if large); then opacity/screen-size pruning.
Instead of torch tensor reallocation + optimizer-state surgery, new Gaussians
are scattered into free (dead) slots of the fixed-capacity arrays and their
Adam moments are zeroed; pruning is `alive &= keep`.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lightgaussian_tpu.models.gaussians import GaussianScene
from lightgaussian_tpu.ops.covariance import quat_to_rotmat
from lightgaussian_tpu.train.optim import zero_moments_at, zero_moments_field
from lightgaussian_tpu.train.state import TrainState
from lightgaussian_tpu.utils.general import inverse_sigmoid


class DensifyReport(NamedTuple):
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    n_dropped: jnp.ndarray  # selections lost to capacity overflow
    n_alive: jnp.ndarray


def _free_slot_table(alive: jnp.ndarray) -> jnp.ndarray:
    """Ascending indices of free slots, padded with `cap` (sort once, O(cap))."""
    cap = alive.shape[0]
    cand = jnp.where(alive, cap, jnp.arange(cap, dtype=jnp.int32))
    return jnp.sort(cand)


def _scatter_params(params: dict, src_params: dict, src_mask: jnp.ndarray, targets: jnp.ndarray):
    """Scatter rows of src_params[src_mask] into `targets` slots (cap = drop)."""
    out = {}
    for k, p in params.items():
        src = src_params[k]
        src = jnp.where(src_mask.reshape((-1,) + (1,) * (src.ndim - 1)), src, 0.0)
        out[k] = p.at[targets].set(src, mode="drop", unique_indices=True)
    return out


def densify_and_prune(
    state: TrainState,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: int,
    percent_dense: float,
    key: jax.Array,
) -> tuple[TrainState, DensifyReport]:
    scene = state.scene
    cap = scene.capacity
    alive = scene.alive
    params = scene.params()

    grads = jnp.where(state.denom > 0, state.xyz_grad_accum / jnp.maximum(state.denom, 1.0), 0.0)
    scales = scene.scales
    max_scale = scales.max(axis=1)
    hot = alive & (grads >= max_grad)
    small = max_scale <= percent_dense * extent
    clone_sel = hot & small
    split_sel = hot & ~small

    free = _free_slot_table(alive)
    n_free = cap - alive.sum()

    # --- clones: copy params verbatim into free slots (gaussian_model.py:716-735)
    clone_rank = jnp.cumsum(clone_sel) - 1
    clone_tgt = jnp.where(clone_sel, free[jnp.minimum(clone_rank, cap - 1)], cap)
    clone_tgt = jnp.where(clone_rank < n_free, clone_tgt, cap)
    new_params = _scatter_params(params, params, clone_sel, clone_tgt)

    # --- splits: two samples from N(mean, Sigma); scales /= (0.8 * 2)
    # (gaussian_model.py:666-714). Child A overwrites the parent slot, child B
    # goes to a free slot (net +1, matching "2 new - 1 pruned").
    n_clone = clone_sel.sum()
    eps_a, eps_b = jax.random.normal(key, (2, cap, 3), jnp.float32)
    rot = quat_to_rotmat(scene.quats)  # [cap, 3, 3]

    def sample(eps):
        return scene.means + jnp.einsum("nij,nj->ni", rot, eps * scales)

    child_scale = jnp.log(jnp.maximum(scales / (0.8 * 2.0), 1e-30))
    split_rank = jnp.cumsum(split_sel) - 1 + n_clone
    split_tgt = jnp.where(split_sel, free[jnp.minimum(split_rank, cap - 1)], cap)
    split_tgt = jnp.where(split_rank < n_free, split_tgt, cap)

    child_b = dict(params)
    child_b["means"] = sample(eps_b)
    child_b["log_scales"] = child_scale
    new_params = _scatter_params(new_params, child_b, split_sel, split_tgt)

    # child A in place
    smask = split_sel.reshape(-1, 1)
    new_params["means"] = jnp.where(smask, sample(eps_a), new_params["means"])
    new_params["log_scales"] = jnp.where(smask, child_scale, new_params["log_scales"])

    # --- new alive mask
    new_alive = alive
    new_alive = new_alive.at[clone_tgt].set(True, mode="drop")
    new_alive = new_alive.at[split_tgt].set(True, mode="drop")

    # --- prune (gaussian_model.py:745-760): low opacity, and when
    # max_screen_size is set, oversized in world space. NOTE the reference's
    # screen-space branch (`max_radii2D > max_screen_size`) is a guaranteed
    # no-op: densification_postfix re-creates max_radii2D as ZEROS for every
    # point (gaussian_model.py:664) right before densify_and_prune reads it
    # (:754), so pruning on an all-time screen-radius max here would mass-cull
    # foreground splats the reference keeps.
    opa = jax.nn.sigmoid(new_params["opacity_logits"])
    prune = opa < min_opacity
    if max_screen_size > 0:
        prune = prune | (jnp.exp(new_params["log_scales"]).max(axis=1) > 0.1 * extent)
    n_alive_before_prune = new_alive.sum()
    pruned = new_alive & prune
    new_alive = new_alive & ~prune

    # --- optimizer moments: zero for every touched slot (new children and
    # in-place split parents), mirroring the reference's fresh zero state for
    # appended tensors.
    touched = jnp.zeros((cap,), bool)
    touched = touched.at[clone_tgt].set(True, mode="drop")
    touched = touched.at[split_tgt].set(True, mode="drop")
    touched = touched | split_sel
    new_opt = zero_moments_at(state.opt, touched)

    scene = dataclasses.replace(scene, alive=new_alive, **new_params)
    new_state = dataclasses.replace(
        state,
        scene=scene,
        opt=new_opt,
        # postfix zeroes max_radii2D for ALL slots (gaussian_model.py:664) —
        # also prevents freed slots from leaking a stale radius max into
        # children scattered there later.
        max_radii2d=jnp.zeros_like(state.max_radii2d),
        xyz_grad_accum=jnp.zeros_like(state.xyz_grad_accum),
        denom=jnp.zeros_like(state.denom),
    )
    wanted = clone_sel.sum() + split_sel.sum()
    placed = (clone_tgt < cap).sum() + (split_tgt < cap).sum()
    report = DensifyReport(
        n_cloned=(clone_tgt < cap).sum(),
        n_split=split_sel.sum(),
        n_pruned=pruned.sum(),
        n_dropped=wanted - placed,
        n_alive=new_alive.sum(),
    )
    return new_state, report


def prune_only(state: TrainState, min_opacity: float, extent: float, max_screen_size: int) -> TrainState:
    """Standalone prune pass (used outside the densify window). Screen-space
    size is deliberately not used — see densify_and_prune."""
    scene = state.scene
    prune = scene.opacities < min_opacity
    if max_screen_size > 0:
        prune = prune | (scene.scales.max(axis=1) > 0.1 * extent)
    return dataclasses.replace(
        state, scene=dataclasses.replace(scene, alive=scene.alive & ~prune)
    )


def reset_opacity(state: TrainState) -> TrainState:
    """Clamp opacity to <= 0.01 and reset its Adam moments
    (`gaussian_model.py:328-334`)."""
    scene = state.scene
    new_logits = inverse_sigmoid(jnp.minimum(scene.opacities, 0.01))
    scene = dataclasses.replace(scene, opacity_logits=new_logits)
    return dataclasses.replace(
        state, scene=scene, opt=zero_moments_field(state.opt, "opacity_logits")
    )


def prune_by_mask(state: TrainState, keep: jnp.ndarray) -> TrainState:
    """GSS-style pruning: keep &= alive (`gaussian_model.py:763-782`)."""
    scene = state.scene
    return dataclasses.replace(
        state, scene=dataclasses.replace(scene, alive=scene.alive & keep)
    )
