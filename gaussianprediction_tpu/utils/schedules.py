"""Learning-rate schedules.

Behavioral reference: get_expon_lr_func
(/root/reference/utils/general_utils.py:29-62) — log-linear interpolation
from lr_init to lr_final over max_steps with an optional sine delay ramp.

Implemented as pure jnp functions of a (possibly traced) step so they can
live inside jitted train steps (the reference recomputes LRs on the host
every iteration; we fold them into the optimizer update).
"""
from __future__ import annotations

import jax.numpy as jnp


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1_000_000):
    """Log-lerp LR decay; jnp twin of the reference helper.

    Returns 0 when the schedule is disabled (both rates 0), matching
    general_utils.py:48-50.
    """
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    lr = delay_rate * log_lerp
    return jnp.where(step < 0, 0.0, lr)


def cosine_lr(step, lr_init: float, total_steps: int, lr_min: float = 0.0):
    """Cosine annealing used by the GCN trainer
    (/root/reference/train_GCN.py:77-79, CosineAnnealingLR)."""
    step = jnp.asarray(step, jnp.float32)
    t = jnp.clip(step / total_steps, 0.0, 1.0)
    return lr_min + 0.5 * (lr_init - lr_min) * (1 + jnp.cos(jnp.pi * t))


def linear_anneal(step, init: float, end_step: int):
    """init * (1 - min(1, step/end_step)): the noise-decay ramp used for
    xyz/time jitter (reference scene/gaussian_model.py:241,254 and
    train.py:92-98)."""
    step = jnp.asarray(step, jnp.float32)
    return init * (1.0 - jnp.minimum(1.0, step / end_step))
