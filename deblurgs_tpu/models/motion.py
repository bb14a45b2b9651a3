"""Camera-motion model: per-image SE(3) Bézier trajectories + shutter alignment.

Reference counterpart: ``scene/motion.py`` (class CameraMotionModule) — the
paper's core. Per image i:

- ``rot_ctrl[i]``/``trans_ctrl[i]``: order-C Bézier control points over the
  se(3) log coordinates (curve_type "se3", the default) or over unit
  quaternion + Cartesian coordinates ("quarternion_cartesian");
- ``nu[i]``: f-2 alignment logits; sub-frame times are
  ``sort(clamp(concat[0, sigmoid(nu), 1]))`` with optional ±1/(2f) jitter
  (``motion.py:209-219``).

The reference renders sub-frames in a serial Python loop
(``motion.py:141-143``); here sub-frame camera construction is vmapped and
the renders run under ``lax.map``/``shard_map`` — the sub-frame axis is this
framework's shardable "sequence" axis (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from deblurgs_tpu.core import bezier, lie
from deblurgs_tpu.core import camera as cam_lib
from deblurgs_tpu.core import transforms as tf


@dataclasses.dataclass(frozen=True)
class MotionConfig:
    curve_order: int = 9
    n_subframes: int = 21
    curve_type: str = "se3"    # "se3" | "quarternion_cartesian"
    curve_random_sample: bool = False


class MotionParams(NamedTuple):
    """Learnable curve parameters, stacked over n images."""

    rot_ctrl: jax.Array    # [n, C+1, 3] (se3 log-rot) or [n, C+1, 4] (quat)
    trans_ctrl: jax.Array  # [n, C+1, 3]
    nu: jax.Array          # [n, f-2] alignment logits


def init_motion(
    rotations: jax.Array,     # [n, 3, 3] c2w rotations (column convention)
    centers: jax.Array,       # [n, 3] camera centers
    cfg: MotionConfig,
    key: jax.Array,
    init_noise: float = 0.001,
) -> MotionParams:
    """Initialize curves at the (static) COLMAP poses + tiny noise.

    se3 path (reference ``motion.py:196-205``): build the row-vector c2w
    matrix (``M[:3,:3] = R^T``, ``M[3,:3] = center``), take ``se3_log_map``,
    Bézier-init each of the 6 log coordinates.
    """
    n = rotations.shape[0]
    k_rot, k_trans = jax.random.split(key)
    if cfg.curve_type == "se3":
        c2w = jnp.zeros((n, 4, 4), jnp.float32)
        c2w = c2w.at[:, :3, :3].set(jnp.swapaxes(rotations, -1, -2))
        c2w = c2w.at[:, 3, :3].set(centers)
        c2w = c2w.at[:, 3, 3].set(1.0)
        params6 = lie.se3_log_map(c2w)
        rot_ctrl = bezier.init_control_points(params6[:, 3:], cfg.curve_order,
                                              init_noise, k_rot)
        trans_ctrl = bezier.init_control_points(params6[:, :3], cfg.curve_order,
                                                init_noise, k_trans)
    elif cfg.curve_type == "quarternion_cartesian":
        # rotmat -> quaternion (w,x,y,z)
        quat = _rotmat_to_quat(rotations)
        rot_ctrl = bezier.init_control_points(quat, cfg.curve_order,
                                              init_noise, k_rot)
        trans_ctrl = bezier.init_control_points(centers, cfg.curve_order,
                                                10 * init_noise, k_trans)
    else:
        raise NotImplementedError(cfg.curve_type)

    f = cfg.n_subframes
    nu0 = jnp.linspace(1.0 / (f - 1), 1.0 - 1.0 / (f - 1), f - 2)
    nu = jnp.broadcast_to(tf.inverse_sigmoid(nu0)[None, :], (n, f - 2))
    return MotionParams(rot_ctrl=rot_ctrl, trans_ctrl=trans_ctrl, nu=nu.astype(jnp.float32))


def _rotmat_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> quaternion (w, x, y, z), w >= 0."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # branchless Shepperd: build all four candidates, pick the best-conditioned
    qw = jnp.sqrt(jnp.maximum(0.0, 1.0 + tr)) / 2
    qx = jnp.sqrt(jnp.maximum(0.0, 1.0 + m00 - m11 - m22)) / 2
    qy = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 + m11 - m22)) / 2
    qz = jnp.sqrt(jnp.maximum(0.0, 1.0 - m00 - m11 + m22)) / 2
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    q = jnp.stack([qw, qx, qy, qz], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def sample_nu(params: MotionParams, idx, cfg: MotionConfig,
              key: jax.Array | None = None) -> jax.Array:
    """Sub-frame time positions for image ``idx`` — [f] in [0, 1], sorted.

    Reference ``_sample_nu_from_alignment`` (``motion.py:209-219``):
    sigmoid(nu) (+ jitter if curve_random_sample) ∪ {0, 1}, clamp, sort.
    """
    nu_mid = jax.nn.sigmoid(params.nu[idx])
    if cfg.curve_random_sample and key is not None:
        f = cfg.n_subframes
        jitter = jax.random.uniform(key, nu_mid.shape) / f - 1.0 / (2 * f)
        nu_mid = nu_mid + jitter
    nu = jnp.concatenate([jnp.zeros(1), nu_mid, jnp.ones(1)])
    return jnp.sort(jnp.clip(nu, 0.0, 1.0))


def sample_c2w(params: MotionParams, idx, nu: jax.Array, cfg: MotionConfig):
    """Sample the trajectory: (c2w rotations [f, 3, 3], centers [f, 3]).

    Reference ``_sample_c2w_from_nu`` (``motion.py:221-256``).
    """
    if cfg.curve_type == "se3":
        trans = bezier.bezier_eval(params.trans_ctrl[idx], nu)  # [f, 3]
        rot = bezier.bezier_eval(params.rot_ctrl[idx], nu)      # [f, 3]
        se3 = jnp.concatenate([trans, rot], axis=-1)
        c2w = lie.se3_exp_map(se3)                              # [f, 4, 4]
        rotations = jnp.swapaxes(c2w[:, :3, :3], -1, -2)
        centers = c2w[:, 3, :3]
    elif cfg.curve_type == "quarternion_cartesian":
        q = bezier.bezier_eval(params.rot_ctrl[idx], nu)
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        rotations = tf.quat_to_rotmat(q, normalize=False)
        centers = bezier.bezier_eval(params.trans_ctrl[idx], nu)
    else:
        raise NotImplementedError(cfg.curve_type)
    return rotations, centers


def subframe_cameras(
    params: MotionParams, idx, nu: jax.Array, proj: jax.Array,
    cfg: MotionConfig,
) -> cam_lib.CameraArrays:
    """Batched CameraArrays for all sub-frames of image ``idx``.

    Mirrors ``_c2w_to_minicam`` (``motion.py:258-294``): ``view[:3,:3]=rot``,
    ``view[3,:3] = -center @ rot``, ``full_proj = view @ proj``.
    """
    rotations, centers = sample_c2w(params, idx, nu, cfg)
    view = cam_lib.c2w_to_view(rotations, centers)              # [f, 4, 4]
    return cam_lib.make_camera_arrays(view, proj)


def middle_cameras(params: MotionParams, proj: jax.Array, cfg: MotionConfig):
    """Mid-trajectory sharp camera per image (reference ``get_middle_cams``,
    ``motion.py:322-334``). Returns CameraArrays batched over images."""
    n = params.nu.shape[0]

    def one(idx):
        nu = sample_nu(params, idx, cfg)
        mid = nu.shape[0] // 2
        return subframe_cameras(params, idx, nu[mid:mid + 1], proj, cfg)

    cams = jax.vmap(one)(jnp.arange(n))
    return jax.tree.map(lambda x: x[:, 0], cams)
