"""Quaternion / covariance / activation helpers (pure JAX).

Mirrors the semantics of reference ``utils/general_utils.py`` and the
fork's activation set in ``scene/gaussian_activation.py``.
Quaternion layout is ``(w, x, y, z)`` (reference ``build_rotation``,
``general_utils.py:117-138``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inverse_sigmoid(x: jax.Array) -> jax.Array:
    """log(x / (1-x)) — reference ``general_utils.py:20``."""
    return jnp.log(x / (1.0 - x))


def quat_to_rotmat(q: jax.Array, normalize: bool = True) -> jax.Array:
    """Quaternion (w,x,y,z) [..., 4] -> rotation matrix [..., 3, 3].

    Matches reference ``build_rotation`` (``general_utils.py:117-138``) when
    ``normalize=True`` and the in-kernel ``computeCov3D`` convention
    (``forward.cu:137-149``: *no* normalization — the Python side normalizes)
    when ``normalize=False``.
    """
    if normalize:
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1),
            jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1),
            jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )
    return R


def build_scaling_rotation(s: jax.Array, q: jax.Array) -> jax.Array:
    """L = R @ diag(s): [..., 3], [..., 4] -> [..., 3, 3].

    Reference ``build_scaling_rotation`` (``general_utils.py:140-149``).
    """
    R = quat_to_rotmat(q, normalize=True)
    return R * s[..., None, :]


def build_covariance(s: jax.Array, q: jax.Array, modifier: float = 1.0) -> jax.Array:
    """World-space 3D covariance Sigma = R diag(s²) R^T packed as 6 uniques.

    Output layout ``[xx, xy, xz, yy, yz, zz]`` matches the CUDA packing
    (``forward.cu:157-162``) and ``strip_symmetric``
    (``general_utils.py:103-115``). Identical result to the kernel's
    ``Sigma = (S R)^T (S R)``, computed fully elementwise (batched 3×3
    matmuls map terribly onto the TPU; Sigma_ij = Σ_k s_k² R_ik R_jk is
    pure VPU work).
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R00 = 1 - 2 * (y * y + z * z)
    R01 = 2 * (x * y - r * z)
    R02 = 2 * (x * z + r * y)
    R10 = 2 * (x * y + r * z)
    R11 = 1 - 2 * (x * x + z * z)
    R12 = 2 * (y * z - r * x)
    R20 = 2 * (x * z - r * y)
    R21 = 2 * (y * z + r * x)
    R22 = 1 - 2 * (x * x + y * y)
    s2 = (modifier * s) ** 2
    s0, s1, s22 = s2[..., 0], s2[..., 1], s2[..., 2]
    xx = s0 * R00 * R00 + s1 * R01 * R01 + s22 * R02 * R02
    xy = s0 * R00 * R10 + s1 * R01 * R11 + s22 * R02 * R12
    xz = s0 * R00 * R20 + s1 * R01 * R21 + s22 * R02 * R22
    yy = s0 * R10 * R10 + s1 * R11 * R11 + s22 * R12 * R12
    yz = s0 * R10 * R20 + s1 * R11 * R21 + s22 * R12 * R22
    zz = s0 * R20 * R20 + s1 * R21 * R21 + s22 * R22 * R22
    return jnp.stack([xx, xy, xz, yy, yz, zz], axis=-1)


def normalize(v: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2 normalize (torch.nn.functional.normalize semantics: clamped norm)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


# ---------------------------------------------------------------------------
# Activations (fork-specific; reference scene/gaussian_activation.py)
# ---------------------------------------------------------------------------


def clamp_opacity(x: jax.Array) -> jax.Array:
    """Opacity activation: clamp(0, 1) — the fork replaces sigmoid with clamp
    (reference ``gaussian_activation.py:29-34``, ``gaussian_model.py:47-48``)."""
    return jnp.clip(x, 0.0, 1.0)


def inverse_clamp_opacity(x: jax.Array) -> jax.Array:
    """Inverse of clamp opacity — also a clamp (reference ``:36-41``)."""
    return jnp.clip(x, 0.0, 1.0)


def lower_bound_exp(x: jax.Array, lower_bound: float = 0.0) -> jax.Array:
    """Scale activation: exp(x) + lb (reference ``:43-52``)."""
    return jnp.exp(x) + lower_bound


def lower_bound_log(x: jax.Array, lower_bound: float = 0.0, eps: float = 0.001) -> jax.Array:
    """Inverse scale activation: log(max(x - lb, eps)) (reference ``:54-64``)."""
    return jnp.log(jnp.maximum(x - lower_bound, eps))


def bound_sigmoid(x: jax.Array, lb: float, ub: float) -> jax.Array:
    """sigmoid(x) / (ub - lb) + lb (reference ``:66-76`` — note the fork's
    unusual "/(ub-lb)" form, reproduced verbatim)."""
    return jax.nn.sigmoid(x) / (ub - lb) + lb


def inverse_bound_sigmoid(x: jax.Array, lb: float, ub: float) -> jax.Array:
    """Inverse of :func:`bound_sigmoid` as the fork wrote it (reference ``:78-89``)."""
    eps = (ub - lb) * 0.001
    return inverse_sigmoid(jnp.clip((x - lb) * (ub - lb), eps, 1.0 - eps))
