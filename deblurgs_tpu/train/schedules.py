"""Learning-rate / hyperparameter schedules (jit-safe, step-indexed).

Reference counterparts:
- ``get_expon_lr_func`` — the DeblurGS-modified Plenoxels log-lerp decay
  (``utils/general_utils.py:31-71``): delay shift, then log-linear between
  lr_init and lr_final over max_steps, with the fork's special cases.
- ``get_scheduler`` — zero-until-warmup then exponential decay
  (``utils/general_utils.py:73-101``), used for alignment LR.
- curve LR — multiplicative halving per step after ``curve_start_iter``
  (``gaussian_model.py:202-203``): lr(t) = lr0 · 0.5^((t − start + 1)/half).

All return jnp scalars from a traced ``step`` so they can live inside the
jitted train step.
"""

from __future__ import annotations

import jax.numpy as jnp


def expon_lr(step, lr_init: float, lr_final: float,
             lr_delay_steps: int = 0, max_steps: int = 1_000_000):
    """DeblurGS log-lerp schedule (reference ``general_utils.py:31-71``)."""
    step = jnp.asarray(step, jnp.float32) - lr_delay_steps
    ms = float(max_steps - lr_delay_steps)
    if lr_init <= 0.0:
        return jnp.zeros(())
    if lr_init <= lr_final:
        return jnp.full((), lr_init, jnp.float32)
    lf = lr_final if lr_final > 0.0 else 1e-6
    t = jnp.clip(step / ms, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lf) * t)
    out = jnp.where(step < 0, lr_init, jnp.where(step > ms, lf, log_lerp))
    return out.astype(jnp.float32)


def warmup_exp_decay(step, lr_init: float, lr_final: float,
                     step_warmup: int, step_final: int):
    """Alignment-LR schedule (reference ``general_utils.py:73-101`` with
    warmup_ratio=0): 0 until warmup, then exponential decay to lr_final."""
    step = jnp.asarray(step, jnp.float32)
    if lr_init <= 1e-8:
        return jnp.zeros(())
    decay_rate = jnp.log(lr_final / lr_init) / max(step_final - step_warmup, 1)
    lr = lr_init * jnp.exp(decay_rate * (step - step_warmup))
    out = jnp.where(step <= step_warmup, 0.0,
                    jnp.where(step <= step_final, lr, lr_final))
    return out.astype(jnp.float32)


def curve_half_life_lr(step, lr_init: float, start_iter: int, half_iter: int):
    """Curve control-point LR: halves every ``half_iter`` steps once the
    curve starts optimizing (reference ``gaussian_model.py:202-203``)."""
    step = jnp.asarray(step, jnp.float32)
    n = jnp.maximum(step - start_iter + 1.0, 0.0)
    return (lr_init * jnp.power(0.5, n / half_iter)).astype(jnp.float32)
