"""Per-group Adam optimizer over the GaussianScene parameter pytree.

Reproduces the reference's setup (`/root/reference/scene/gaussian_model.py:
179-223`): torch.optim.Adam(eps=1e-15), per-group learning rates — xyz on the
delayed exponential schedule scaled by the scene extent, f_rest at
feature_lr/20 — plus an optional global LR multiplier schedule (the torch
ExponentialLR used by the finetune/distill drivers).

Implemented by hand (not optax) because densification must surgically zero the
first/second moments of re-allocated slots, mirroring `_prune_optimizer` /
`cat_tensors_to_optimizer` (`gaussian_model.py:549-634`) — here that is a
masked write into the moment arrays.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from lightgaussian_tpu.config import OptimizationParams
from lightgaussian_tpu.utils.general import expon_lr_schedule

BETA1, BETA2 = 0.9, 0.999
EPS = 1e-15


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AdamState:
    mu: Dict[str, jnp.ndarray]
    nu: Dict[str, jnp.ndarray]
    count: jnp.ndarray  # scalar int32


def init_adam(params: Dict[str, jnp.ndarray]) -> AdamState:
    z = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=z, nu=jax.tree.map(jnp.zeros_like, params), count=jnp.int32(0))


def make_lr_fns(opt: OptimizationParams, spatial_lr_scale: float) -> Dict[str, Callable]:
    """Per-parameter LR schedules keyed by GaussianScene param field."""
    xyz = expon_lr_schedule(
        opt.position_lr_init * spatial_lr_scale,
        opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        lr_delay_steps=0,
        max_steps=opt.position_lr_max_steps,
    )
    const = lambda v: (lambda step: jnp.float32(v))
    return {
        "means": xyz,
        "sh_dc": const(opt.feature_lr),
        "sh_rest": const(opt.feature_lr / 20.0),
        "opacity_logits": const(opt.opacity_lr),
        "log_scales": const(opt.scaling_lr),
        "quats": const(opt.rotation_lr),
    }


def adam_update(
    params: Dict[str, jnp.ndarray],
    grads: Dict[str, jnp.ndarray],
    state: AdamState,
    lr_fns: Dict[str, Callable],
    step: jnp.ndarray,
    alive: jnp.ndarray,
    lr_mult: jnp.ndarray | float = 1.0,
):
    """One Adam step; dead slots are frozen (their grads are 0 by construction,
    but freezing also keeps their moments at 0)."""
    count = state.count + 1
    c1 = 1.0 - BETA1 ** count.astype(jnp.float32)
    c2 = 1.0 - BETA2 ** count.astype(jnp.float32)

    new_p, new_mu, new_nu = {}, {}, {}
    for k, p in params.items():
        g = grads[k]
        mu = BETA1 * state.mu[k] + (1.0 - BETA1) * g
        nu = BETA2 * state.nu[k] + (1.0 - BETA2) * (g * g)
        # The global multiplier (ExponentialLR in the finetune/distill drivers)
        # never sticks to xyz in the reference: update_learning_rate OVERWRITES
        # the xyz group's lr from its schedule every iteration
        # (`gaussian_model.py:225-231`), so gamma-decay applies to the other
        # groups only.
        lr = lr_fns[k](step) * (1.0 if k == "means" else lr_mult)
        upd = lr * (mu / c1) / (jnp.sqrt(nu / c2) + EPS)
        mask = alive.reshape((-1,) + (1,) * (p.ndim - 1))
        new_p[k] = jnp.where(mask, p - upd, p)
        new_mu[k] = jnp.where(mask, mu, state.mu[k])
        new_nu[k] = jnp.where(mask, nu, state.nu[k])
    return new_p, AdamState(mu=new_mu, nu=new_nu, count=count)


def zero_moments_at(state: AdamState, slot_mask: jnp.ndarray) -> AdamState:
    """Zero moments for slots in `slot_mask` — the reference's exp_avg reset on
    replaced tensors (`gaussian_model.py:549-562`)."""

    def z(x):
        mask = slot_mask.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(mask, 0.0, x)

    return AdamState(
        mu=jax.tree.map(z, state.mu), nu=jax.tree.map(z, state.nu), count=state.count
    )


def zero_moments_field(state: AdamState, field: str) -> AdamState:
    """Zero moments of one param field everywhere — opacity reset semantics
    (`gaussian_model.py:328-334` + `replace_tensor_to_optimizer`)."""
    mu = dict(state.mu)
    nu = dict(state.nu)
    mu[field] = jnp.zeros_like(mu[field])
    nu[field] = jnp.zeros_like(nu[field])
    return AdamState(mu=mu, nu=nu, count=state.count)
