"""iNeRF-style test-pose refinement (reference ``test.py:39-186``).

After curve optimization the trained scene's world frame has drifted from
the COLMAP frame, so held-out poses must be re-fit before scoring: per test
view, a unit quaternion + translation parameterize the view matrix, and an
Adam loop minimizes the L1 photometric error of the (tone-mapped, clamped)
render against the ground truth — gradients flow through the rasterizer's
camera-matrix path exactly as in training.

Reference hyperparameters: lr 5e-5 (rot) / 5e-4 (trans), Adam eps 1e-15,
StepLR ×0.9 every ``num_iter//20`` epochs, one epoch = one step per view.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from deblurgs_tpu.core import transforms as tf
from deblurgs_tpu.core.camera import CameraArrays, make_camera_arrays
from deblurgs_tpu.models import gaussians as gm
from deblurgs_tpu.models import tonemap as tm
from deblurgs_tpu.models.motion import _rotmat_to_quat
from deblurgs_tpu.ops.rasterize import render
from deblurgs_tpu.train.losses import l1_loss


class PoseParams(NamedTuple):
    quat: jax.Array    # [n, 4] (w,x,y,z) — c2w rotation
    trans: jax.Array   # [n, 3] — w2c translation


class SharedAdamState(NamedTuple):
    """ONE torch Adam over the full ``[n, ...]`` pose tensors, exactly as the
    reference (``test.py:154-158``: a single ``optim.Adam`` over ``_rot``/
    ``_trans``). A step for view *i* backprops a gradient that is zero on
    every other row, but torch still updates the WHOLE tensor: other rows'
    moments decay (``mu *= b1``, ``nu *= b2``) and their params drift by the
    bias-corrected residual momentum, with a single GLOBAL step count per
    tensor. Moments are shaped like PoseParams; ``step`` is [] int32."""

    mu: PoseParams
    nu: PoseParams
    step: jax.Array


def init_shared_adam(pose: PoseParams) -> SharedAdamState:
    z = jax.tree.map(jnp.zeros_like, pose)
    return SharedAdamState(mu=z, nu=jax.tree.map(jnp.zeros_like, pose),
                           step=jnp.zeros((), jnp.int32))


def shared_adam_update(pose: PoseParams, grads: PoseParams,
                       state: SharedAdamState, lr: PoseParams,
                       *, b1: float = 0.9, b2: float = 0.999,
                       eps: float = 1e-15):
    """One shared-optimizer Adam step over the FULL tensors (torch
    semantics: reference Adam eps 1e-15, one global step count; rows with
    zero grads still decay moments and move by residual momentum)."""
    t = (state.step + 1).astype(jnp.float32)

    def leaf(p, g, mu, nu, lr_i):
        mu2 = b1 * mu + (1 - b1) * g
        nu2 = b2 * nu + (1 - b2) * (g * g)
        mu_hat = mu2 / (1 - b1**t)
        nu_hat = nu2 / (1 - b2**t)
        upd = jnp.asarray(lr_i, p.dtype) * mu_hat / (jnp.sqrt(nu_hat) + eps)
        return p - upd, mu2, nu2

    leaves = [leaf(*args) for args in zip(
        jax.tree.leaves(pose), jax.tree.leaves(grads),
        jax.tree.leaves(state.mu), jax.tree.leaves(state.nu),
        jax.tree.leaves(lr))]
    treedef = jax.tree.structure(pose)
    new_pose = jax.tree.unflatten(treedef, [l[0] for l in leaves])
    new_mu = jax.tree.unflatten(treedef, [l[1] for l in leaves])
    new_nu = jax.tree.unflatten(treedef, [l[2] for l in leaves])
    return new_pose, SharedAdamState(mu=new_mu, nu=new_nu,
                                     step=state.step + 1)


def init_pose_params(rotations: jax.Array, translations: jax.Array) -> PoseParams:
    """rotations: [n,3,3] c2w; translations: [n,3] w2c (CameraInfo R/T)."""
    return PoseParams(quat=_rotmat_to_quat(rotations),
                      trans=jnp.asarray(translations, jnp.float32))


def pose_to_camera(params: PoseParams, idx, proj: jax.Array) -> CameraArrays:
    """Build the differentiable view matrix (reference ``OptimPoseModel.forward``:
    ``view[:3,:3] = rotmat``, ``view[3,:3] = trans`` in the row-vector
    convention)."""
    quat = params.quat[idx] + 1e-8
    R = tf.quat_to_rotmat(quat, normalize=True)
    view = jnp.zeros((4, 4), jnp.float32)
    view = view.at[:3, :3].set(R)
    view = view.at[3, :3].set(params.trans[idx])
    view = view.at[3, 3].set(1.0)
    return make_camera_arrays(view, proj)


def optimize_test_poses(
    session,
    gt_images: jax.Array,        # [n, H, W, 3]
    rotations, translations,     # initial poses
    proj: jax.Array,
    *,
    num_iter_per_view: int = 2000,
    lr_rot: float = 5e-5,
    lr_trans: float = 5e-4,
    verbose: bool = True,
) -> PoseParams:
    """Refine all test poses; returns the optimized PoseParams."""
    pose = init_pose_params(jnp.asarray(rotations, jnp.float32),
                            jnp.asarray(translations, jnp.float32))
    state = init_shared_adam(pose)
    rin = gm.render_inputs(session.params, session.gcfg)
    cs = session.scene.camera_static
    n = pose.quat.shape[0]
    bg = jnp.zeros(3)

    def loss_fn(pose, idx, gt):
        cam = pose_to_camera(pose, idx, proj)
        out = render(rin["means3d"], rin["scales"], rin["rotations"],
                     rin["opacities"], rin["shs"], cam, cs, bg,
                     cfg=session.rcfg, sh_degree=session.gcfg.sh_degree,
                     active=session.aux.active)
        img = jnp.clip(tm.tone_map(out.image, session.tone_mapping), 0.0, 1.0)
        return l1_loss(img, gt), img

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def step(pose, state, idx, gt, lr_scale):
        (loss, img), g = grad_fn(pose, idx, gt)
        lr = PoseParams(quat=lr_rot * lr_scale, trans=lr_trans * lr_scale)
        pose, state = shared_adam_update(pose, g, state, lr)
        mse = jnp.mean((img - gt) ** 2)
        return pose, state, loss, mse

    step_size = max(num_iter_per_view // 20, 1)
    ema = 0.0
    rng = jax.random.PRNGKey(0)
    for epoch in range(num_iter_per_view):
        lr_scale = jnp.float32(0.9 ** (epoch // step_size))
        rng, k = jax.random.split(rng)
        order = jax.random.permutation(k, n)
        for idx in order:
            pose, state, loss, mse = step(pose, state, idx,
                                          gt_images[idx], lr_scale)
            ema = 0.6 * ema + 0.4 * float(mse)
        if verbose and epoch % 20 == 0:
            import math

            print(f"  pose-opt epoch {epoch}: "
                  f"PSNR={20 * math.log10(1.0 / math.sqrt(max(ema, 1e-12))):6.2f}")
    return pose
