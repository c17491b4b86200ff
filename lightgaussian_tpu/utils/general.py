"""Small general utilities: activations inverses and LR schedules.

The exponential LR schedule matches the reference's `get_expon_lr_func`
(`/root/reference/utils/general_utils.py:32-65`): log-space lerp from lr_init to
lr_final over max_steps, with an optional sine-eased delay multiplier. Returned
as a pure function of a (possibly traced) step so it can live inside a jitted
train step.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def expon_lr_schedule(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    """Continuous log-lerp schedule with optional delayed warmup.

    Returns f(step)->lr; matches `get_expon_lr_func` semantics including the
    lr_init==0 -> always 0 disable switch.
    """
    if lr_init == 0.0 and lr_final == 0.0:
        return lambda step: jnp.zeros_like(jnp.asarray(step, jnp.float32))

    log_init = np.log(max(lr_init, 1e-30))
    log_final = np.log(max(lr_final, 1e-30))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(log_init * (1.0 - t) + log_final * t)
        lr = delay_rate * log_lerp
        # step < 0 disables (reference returns 0.0 for negative steps).
        return jnp.where(step < 0, 0.0, lr)

    return schedule


def exponential_decay_every(gamma: float, every: int):
    """Stepwise gamma^(step // every) multiplier, matching torch ExponentialLR
    stepped every `every` iters (`prune_finetune.py:97,140-141`)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.int32)
        return jnp.power(gamma, (step // every).astype(jnp.float32))

    return schedule


def safe_state(quiet: bool = False, seed: int = 0):
    """Deterministic run setup — the TPU analogue of the reference's
    `safe_state` (`utils/general_utils.py:122-151`): seeds host RNGs and
    timestamps stdout lines. Device RNG is explicit (jax.random keys), so
    nothing to seed there."""
    import builtins
    import random as _random
    import sys
    from datetime import datetime

    import numpy as _np

    _random.seed(seed)
    _np.random.seed(seed)

    if not quiet:
        orig_write = sys.stdout.write

        def write(text):
            if text.endswith("\n") and text != "\n":
                ts = datetime.now().strftime("%d/%m %H:%M:%S")
                text = text.replace("\n", f" [{ts}]\n")
            return orig_write(text)

        if not getattr(sys.stdout, "_lg_tpu_wrapped", False):
            sys.stdout.write = write
            sys.stdout._lg_tpu_wrapped = True
