"""Gaussian scene model as a static-capacity pytree.

Reference counterpart: ``scene/gaussian_model.py`` (class GaussianModel).
The torch version grows/shrinks six parameter tensors with optimizer-state
surgery; here capacity is static (``[capacity, ...]`` leaves + ``active``
mask) so the whole train step jit-compiles — densification becomes masked
scatters (see ``models/densify.py``) and "optimizer surgery" becomes zeroing
Adam moments at recycled slots.

Fork-specific activation set is preserved (``gaussian_model.py:29-51``):
opacity = clamp(0,1) (not sigmoid), scaling = exp+lower-bound (or bounded
sigmoid), rotation = L2 normalize, isotropic option broadcasts scaling[:, :1].
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from deblurgs_tpu.core import sh as sh_lib
from deblurgs_tpu.core import transforms as tf
from deblurgs_tpu.ops.knn import knn3_mean_sq_dist


@dataclasses.dataclass(frozen=True)
class GaussianConfig:
    """Static model hyperparameters (reference ``ModelParams`` subset)."""

    sh_degree: int = 2
    alpha_lower_bound: float = 0.0
    scale_lb: float = 0.0
    scale_ub: float = -1.0     # < 0 → exp activation; else bounded sigmoid
    use_isotropic: bool = False
    use_sigmoid: bool = False  # activation == "sigmoid"
    z_near: float = 0.2
    z_far: float = 100.0

    @property
    def sh_coeffs(self) -> int:
        return (self.sh_degree + 1) ** 2


class GaussianParams(NamedTuple):
    """Learnable leaves, all [capacity, ...] (raw, pre-activation)."""

    xyz: jax.Array       # [P, 3]
    f_dc: jax.Array      # [P, 1, 3]
    f_rest: jax.Array    # [P, K-1, 3]
    scaling: jax.Array   # [P, 3]
    rotation: jax.Array  # [P, 4] (w, x, y, z)
    opacity: jax.Array   # [P, 1]


class GaussianAux(NamedTuple):
    """Non-learnable per-slot state (densification bookkeeping)."""

    active: jax.Array          # [P] bool
    max_radii2d: jax.Array     # [P] f32
    xyz_grad_accum: jax.Array  # [P] f32 — ||viewspace grad||-accumulator
    denom: jax.Array           # [P] f32


# ---------------------------------------------------------------------------
# Activations (reference gaussian_model.py:114-146 properties)
# ---------------------------------------------------------------------------


def get_scaling(params: GaussianParams, cfg: GaussianConfig) -> jax.Array:
    raw = params.scaling
    if cfg.use_isotropic:
        raw = jnp.broadcast_to(raw[:, :1], raw.shape)
    if cfg.scale_ub < 0.0:
        return tf.lower_bound_exp(raw, cfg.scale_lb)
    return tf.bound_sigmoid(raw, cfg.scale_lb, cfg.scale_ub)


def inverse_scaling(value: jax.Array, cfg: GaussianConfig) -> jax.Array:
    if cfg.scale_ub < 0.0:
        return tf.lower_bound_log(value, cfg.scale_lb)
    return tf.inverse_bound_sigmoid(value, cfg.scale_lb, cfg.scale_ub)


def get_opacity(params: GaussianParams, cfg: GaussianConfig) -> jax.Array:
    return tf.clamp_opacity(params.opacity)


def get_rotation(params: GaussianParams) -> jax.Array:
    return tf.normalize(params.rotation)


def get_features(params: GaussianParams) -> jax.Array:
    """[P, K, 3] concat of DC + rest (reference ``get_features``)."""
    return jnp.concatenate([params.f_dc, params.f_rest], axis=1)


def num_active(aux: GaussianAux) -> jax.Array:
    return jnp.sum(aux.active.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Initialization (reference create_from_pcd, gaussian_model.py:148-173)
# ---------------------------------------------------------------------------


def create_from_pcd(
    points: jax.Array,
    colors: jax.Array,
    cfg: GaussianConfig,
    capacity: int,
) -> tuple[GaussianParams, GaussianAux]:
    """Seed Gaussians from a point cloud, padded to ``capacity`` slots.

    - DC color = RGB2SH (with the fork's inverse-sigmoid variant);
    - scale = inverse_activation(sqrt(mean 3-NN squared distance));
    - rotation = identity quaternion; opacity ≈ 0.1 via inverse activation.
    Inactive padding slots hold safe values and ``active=False``.
    """
    n = points.shape[0]
    assert n <= capacity, f"capacity {capacity} < point count {n}"
    k = cfg.sh_coeffs

    if cfg.use_sigmoid:
        fused = sh_lib.rgb_to_sh(tf.inverse_sigmoid(jnp.clip(colors, 1e-4, 1 - 1e-4)),
                                 use_sigmoid=True)
    else:
        fused = sh_lib.rgb_to_sh(colors, use_sigmoid=False)

    # scale seeding: exact 3-NN mean squared distance (reference distCUDA2).
    # Large clouds use the native host grid search; otherwise the on-device
    # exact pass.
    dist2 = None
    if n > 50_000:
        from deblurgs_tpu import native
        import numpy as _np

        host = native.knn3_mean_sq(_np.asarray(points))
        if host is not None:
            dist2 = jnp.asarray(host)
    if dist2 is None:
        dist2 = knn3_mean_sq_dist(points)
    dist2 = jnp.maximum(dist2, 1e-7)
    scales = inverse_scaling(jnp.sqrt(dist2), cfg)[:, None].repeat(3, axis=1)

    lb = cfg.alpha_lower_bound
    opac_val = lb + (1.0 - lb) * 0.1
    opacity = tf.inverse_clamp_opacity(jnp.full((n, 1), opac_val, jnp.float32))

    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((capacity - n,) + x.shape[1:], fill, x.dtype)], axis=0
        )

    rotation = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    params = GaussianParams(
        xyz=pad(points.astype(jnp.float32)),
        f_dc=pad(fused[:, None, :].astype(jnp.float32)),
        f_rest=pad(jnp.zeros((n, k - 1, 3), jnp.float32)),
        scaling=pad(scales.astype(jnp.float32)),
        rotation=pad(rotation).at[n:, 0].set(1.0),
        opacity=pad(opacity),
    )
    aux = GaussianAux(
        active=jnp.arange(capacity) < n,
        max_radii2d=jnp.zeros(capacity, jnp.float32),
        xyz_grad_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
    )
    return params, aux


def reset_opacity(params: GaussianParams, cfg: GaussianConfig,
                  new_opacity: float | None = None) -> GaussianParams:
    """Clamp opacities down to ≈0.1 (reference ``reset_opacity``,
    ``gaussian_model.py:247-253``). Returns updated params; the caller must
    zero the opacity Adam moments (reference ``replace_tensor_to_optimizer``)."""
    if new_opacity is None:
        lb = cfg.alpha_lower_bound
        new_opacity = lb + (1.0 - lb) * min(1.0, max(0.0, 0.1))
    cur = get_opacity(params, cfg)
    target = tf.inverse_clamp_opacity(jnp.minimum(cur, new_opacity))
    return params._replace(opacity=target)


def render_inputs(params: GaussianParams, cfg: GaussianConfig):
    """Activated tensors in the layout ``ops.rasterize.render`` expects."""
    return dict(
        means3d=params.xyz,
        scales=get_scaling(params, cfg),
        rotations=get_rotation(params),
        opacities=get_opacity(params, cfg)[:, 0],
        shs=get_features(params),
    )


def decay_opacity(params: GaussianParams, cfg: GaussianConfig,
                  r: float) -> GaussianParams:
    """Multiply activated opacity by r (reference ``decay_opacity``,
    ``gaussian_model.py:460-462``)."""
    return params._replace(
        opacity=tf.inverse_clamp_opacity(get_opacity(params, cfg) * r))


def light_prune(aux: GaussianAux, keep_mask: jax.Array) -> GaussianAux:
    """Deactivate slots outside ``keep_mask`` without optimizer surgery
    (reference ``light_prune``, ``gaussian_model.py:346-353``; with static
    capacity this is just an active-mask intersection)."""
    return aux._replace(active=aux.active & keep_mask)


def one_up_sh_degree(active_degree: int, cfg: GaussianConfig) -> int:
    """Reference ``oneupSHdegree`` — host-side since SH degree is a static
    compile parameter here."""
    return min(active_degree + 1, cfg.sh_degree)
