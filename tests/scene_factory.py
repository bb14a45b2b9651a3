"""Shared toy-scene factories for rasterizer tests."""

import math

import jax
import jax.numpy as jnp

from deblurgs_tpu.core import camera as cam_lib


def make_camera(width=64, height=48, fovx=1.1, dist=4.0, angle=0.0):
    fovy = 2 * math.atan(math.tan(fovx / 2) * height / width)
    cs = cam_lib.CameraStatic(
        width=width, height=height,
        tanfovx=math.tan(fovx / 2), tanfovy=math.tan(fovy / 2),
        znear=0.01, zfar=100.0,
    )
    # camera on a circle of radius `dist` around origin, looking at origin
    from deblurgs_tpu.core import lie

    rot = lie.so3_exp_map(jnp.array([[0.0, angle, 0.0]]))[0]  # c2w rotation
    center = rot @ jnp.array([0.0, 0.0, -dist])
    view = cam_lib.c2w_to_view(rot, center)
    proj = cam_lib.get_projection_matrix(cs.znear, cs.zfar, fovx, fovy)
    cam = cam_lib.make_camera_arrays(view, proj)
    return cam, cs, proj


def make_gaussians(key, n=200, spread=1.5, sh_deg=0, opacity_max=0.9,
                   scale_rng=(0.02, 0.3)):
    ks = jax.random.split(key, 6)
    means = jax.random.normal(ks[0], (n, 3)) * spread
    scales = jnp.exp(
        jax.random.uniform(
            ks[1], (n, 3),
            minval=math.log(scale_rng[0]), maxval=math.log(scale_rng[1]),
        )
    )
    q = jax.random.normal(ks[2], (n, 4))
    rotations = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    opacities = jax.random.uniform(ks[3], (n,), minval=0.05, maxval=opacity_max)
    k_sh = (sh_deg + 1) ** 2
    shs = jax.random.normal(ks[4], (n, k_sh, 3)) * 0.4
    return means, scales, rotations, opacities, shs
