"""Bézier curve evaluation (pure JAX, differentiable).

Reference: ``scene/bezier.py`` — Bernstein basis via binomial coefficients,
``coeff[k] = C(C,k) * t^(C-k) * (1-t)^k`` with the reference's descending-power
ordering (``bezier.py:54-64``: ``t ** arange(C, -1, -1) * (1-t) ** arange(0, C+1)``),
then ``point(t) = sum_k coeff[k] * ctrl[k]``.

Note the ordering consequence: ``ctrl[0]`` is the t=1 endpoint and ``ctrl[-1]``
the t=0 endpoint (the reference initializes all control points identically so
this is invisible at init; we match it so loaded reference checkpoints behave
identically).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def binom_coefficients(order: int) -> np.ndarray:
    """[C(order, 0), ..., C(order, order)] as float64 numpy."""
    return np.array([math.comb(order, k) for k in range(order + 1)], dtype=np.float64)


def bernstein_basis(t: jax.Array, order: int) -> jax.Array:
    """t: [...,] in [0,1] -> basis [..., order+1] (reference ordering).

    ``basis[..., k] = C(order,k) * t^(order-k) * (1-t)^k``.
    """
    binom = jnp.asarray(binom_coefficients(order), dtype=t.dtype)
    desc = jnp.arange(order, -1, -1, dtype=t.dtype)
    asc = jnp.arange(0, order + 1, dtype=t.dtype)
    # 0**0 := 1 at the endpoints (matches torch pow semantics used by reference)
    tb = t[..., None]
    # grad-safe bases: the pow VJP is g*k*x^(k-1), which at x=0, k=0 is
    # 0*inf = NaN — an alignment sample that lands exactly on 0 or 1 (clip
    # under jitter, or a saturated sigmoid) would send NaN into the nu
    # cotangent. Guard the BASE of the exponent-0 column (guarding the
    # output still evaluates the NaN inside the select's VJP).
    tb_d = jnp.where(desc == 0, jnp.ones_like(tb), tb)
    om_a = jnp.where(asc == 0, jnp.ones_like(tb), 1.0 - tb)
    return (tb_d ** desc) * (om_a ** asc) * binom


def bezier_eval(control_points: jax.Array, t: jax.Array) -> jax.Array:
    """Evaluate a Bézier curve.

    Args:
      control_points: [order+1, d] (or batched [..., order+1, d]).
      t: [f] sample positions in [0, 1].
    Returns: [..., f, d] sampled points.

    Mirrors ``BezierModel.forward`` (reference ``bezier.py:66-83``).
    """
    order = control_points.shape[-2] - 1
    coeff = bernstein_basis(t, order)  # [f, order+1]
    return jnp.einsum("fk,...kd->...fd", coeff, control_points)


def init_control_points(initial_points: jax.Array, order: int,
                        noise: float, key: jax.Array) -> jax.Array:
    """Repeat each pose into order+1 control points + N(0, noise) jitter.

    Reference ``bezier.py:40-46`` (noise 0.001 default; 0.01 for
    quaternion-cartesian translations, ``motion.py:194``).
    """
    pts = jnp.repeat(initial_points[:, None, :], order + 1, axis=1)
    return pts + noise * jax.random.normal(key, pts.shape, dtype=pts.dtype)
