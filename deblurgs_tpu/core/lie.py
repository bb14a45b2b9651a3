"""SO(3)/SE(3) exponential & logarithm maps (pure JAX).

Semantics follow the pytorch3d functions the reference vendors
(``/root/reference/utils/pytorch3d_functions.py``): in particular the
*row-vector* SE(3) matrix convention

    M = [ R 0 ]
        [ T 1 ]            (points transform as ``p_row @ M``)

so ``se3_exp_map`` returns the transpose of the usual column-vector matrix
(reference ``pytorch3d_functions.py:373-457``), and a 6-D log is laid out as
``[log_translation | log_rotation]``.

All maps are batched over a leading axis and are jit/vmap/grad-safe: the
singular neighbourhoods are handled with the same eps clamps / Taylor
switches as the reference so that round-trip and gradient behaviour match.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DEFAULT_ACOS_BOUND = 1.0 - 1e-4


def hat(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of 3-vectors. v: [..., 3] -> [..., 3, 3].

    Matches reference ``pytorch3d_functions.py:329-362``:
        [  0  -z   y ]
        [  z   0  -x ]
        [ -y   x   0 ]
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], axis=-1),
            jnp.stack([z, o, -x], axis=-1),
            jnp.stack([-y, x, o], axis=-1),
        ],
        axis=-2,
    )


def hat_inv(h: jax.Array) -> jax.Array:
    """Inverse hat. h: [..., 3, 3] skew-symmetric -> [..., 3]."""
    return jnp.stack([h[..., 2, 1], h[..., 0, 2], h[..., 1, 0]], axis=-1)


def acos_linear_extrapolation(
    x: jax.Array, bound: float = _DEFAULT_ACOS_BOUND
) -> jax.Array:
    """``arccos`` with 1st-order linear extrapolation outside [-bound, bound].

    Stable-gradient acos (reference ``pytorch3d_functions.py:26-81``).
    """
    dacos = -1.0 / jnp.sqrt(jnp.maximum(1.0 - bound * bound, 1e-12))
    upper = (x - bound) * dacos + jnp.arccos(jnp.asarray(bound, x.dtype))
    lower = (x + bound) * dacos + jnp.arccos(jnp.asarray(-bound, x.dtype))
    x_safe = jnp.clip(x, -bound, bound)
    mid = jnp.arccos(x_safe)
    return jnp.where(x >= bound, upper, jnp.where(x <= -bound, lower, mid))


def _so3_exp_terms(log_rot: jax.Array, eps: float = 1e-4):
    """Shared intermediates of the Rodrigues formula.

    Mirrors ``_so3_exp_map`` (reference ``pytorch3d_functions.py:213-247``).
    """
    nrms = jnp.sum(log_rot * log_rot, axis=-1)
    rot_angles = jnp.sqrt(jnp.maximum(nrms, eps))
    inv = 1.0 / rot_angles
    fac1 = inv * jnp.sin(rot_angles)
    fac2 = inv * inv * (1.0 - jnp.cos(rot_angles))
    skews = hat(log_rot)
    skews_sq = skews @ skews
    eye = jnp.eye(3, dtype=log_rot.dtype)
    R = fac1[..., None, None] * skews + fac2[..., None, None] * skews_sq + eye
    return R, rot_angles, skews, skews_sq


def so3_exp_map(log_rot: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Rodrigues formula. log_rot: [..., 3] -> R: [..., 3, 3]."""
    return _so3_exp_terms(log_rot, eps)[0]


def so3_log_map(R: jax.Array, eps: float = 1e-4, cos_bound: float = 1e-4) -> jax.Array:
    """Rotation matrix -> axis-angle vector. R: [..., 3, 3] -> [..., 3].

    Mirrors reference ``pytorch3d_functions.py:250-298`` including the
    Taylor fallback of ``phi / (2 sin phi)`` near phi = 0.
    """
    rot_trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    phi_cos = (rot_trace - 1.0) * 0.5
    phi = acos_linear_extrapolation(phi_cos, 1.0 - cos_bound)
    phi_sin = jnp.sin(phi)
    ok = jnp.abs(phi_sin) > (0.5 * eps)
    phi_sin_safe = jnp.where(ok, phi_sin, 1.0)
    phi_factor = jnp.where(ok, phi / (2.0 * phi_sin_safe), 0.5 + phi * phi / 12.0)
    log_rot_hat = phi_factor[..., None, None] * (R - jnp.swapaxes(R, -2, -1))
    return hat_inv(log_rot_hat)


def _se3_v_matrix(log_rot, skews, skews_sq, rot_angles):
    """The "V" matrix of the SE(3) exp map (reference ``:546-585``)."""
    eye = jnp.eye(3, dtype=log_rot.dtype)
    ang = rot_angles
    t1 = ((1.0 - jnp.cos(ang)) / (ang * ang))[..., None, None]
    t2 = ((ang - jnp.sin(ang)) / (ang * ang * ang))[..., None, None]
    return eye + skews * t1 + skews_sq * t2


def se3_exp_map(log_transform: jax.Array, eps: float = 1e-4) -> jax.Array:
    """6-D se(3) log ``[log_T | log_R]`` -> [..., 4, 4] row-vector SE(3) matrix.

    Returns the *transposed* matrix: ``M[..., :3, :3] = R^T`` (apply as
    ``p_row @ M``); ``M[..., 3, :3] = V @ log_T``. Matches reference
    ``pytorch3d_functions.py:373-457`` (note its final ``.permute(0, 2, 1)``).
    """
    log_translation = log_transform[..., :3]
    log_rotation = log_transform[..., 3:]
    R, rot_angles, skews, skews_sq = _so3_exp_terms(log_rotation, eps)
    V = _se3_v_matrix(log_rotation, skews, skews_sq, rot_angles)
    T = jnp.einsum("...ij,...j->...i", V, log_translation)

    batch = log_transform.shape[:-1]
    M = jnp.zeros(batch + (4, 4), dtype=log_transform.dtype)
    M = M.at[..., :3, :3].set(jnp.swapaxes(R, -2, -1))
    M = M.at[..., 3, :3].set(T)
    M = M.at[..., 3, 3].set(1.0)
    return M


def se3_log_map(
    transform: jax.Array, eps: float = 1e-4, cos_bound: float = 1e-4
) -> jax.Array:
    """[..., 4, 4] row-vector SE(3) matrix -> 6-D log ``[log_T | log_R]``.

    Inverse of :func:`se3_exp_map` (reference ``pytorch3d_functions.py:462-541``).
    """
    R = jnp.swapaxes(transform[..., :3, :3], -2, -1)
    log_rotation = so3_log_map(R, eps=eps, cos_bound=cos_bound)
    T = transform[..., 3, :3]
    nrms = jnp.sum(log_rotation * log_rotation, axis=-1)
    rot_angles = jnp.sqrt(jnp.maximum(nrms, eps))
    skews = hat(log_rotation)
    V = _se3_v_matrix(log_rotation, skews, skews @ skews, rot_angles)
    log_translation = jnp.linalg.solve(V, T[..., None])[..., 0]
    return jnp.concatenate([log_translation, log_rotation], axis=-1)
