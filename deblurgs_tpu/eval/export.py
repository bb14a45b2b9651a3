"""Render-path construction + video export (reference ``utils/export_utils.py``,
``utils/mvg_utils.py``): spiral camera path around the mean trained pose with
look-at from the rendered center depth, depth colorization, video writing.
"""

from __future__ import annotations

import math
import os

import jax.numpy as jnp
import numpy as np

from deblurgs_tpu.core.camera import c2w_to_view, make_camera_arrays
from deblurgs_tpu.models import motion as motion_lib


def mean_camera_pose(c2ws: np.ndarray) -> np.ndarray:
    """Mean SE(3) pose: mean translation + chordal-mean rotation
    (reference ``mvg_utils.mean_camera_pose``)."""
    from scipy.spatial.transform import Rotation

    mean = np.eye(4)
    mean[:3, 3] = c2ws[:, :3, 3].mean(axis=0)
    mean[:3, :3] = Rotation.from_matrix(c2ws[:, :3, :3]).mean().as_matrix()
    return mean


def c2w_from_eye(eye, lookat, up) -> np.ndarray:
    """Look-at builder (reference ``mvg_utils.get_c2w_from_eye``)."""
    z = lookat - eye
    x = np.cross(up, z)
    y = np.cross(z, x)
    x, y, z = (v / np.linalg.norm(v) for v in (x, y, z))
    c2w = np.eye(4)
    c2w[:3, :3] = np.stack([x, y, z], axis=0).T
    c2w[:3, 3] = eye
    return c2w


def middle_c2ws(session) -> np.ndarray:
    """c2w matrices of the per-image mid-trajectory sharp cameras."""
    cams = motion_lib.middle_cameras(session.motion, jnp.asarray(session.scene.proj),
                                     session.mcfg)
    view = np.asarray(cams.view)           # [n, 4, 4] row-vector convention
    n = view.shape[0]
    c2ws = np.tile(np.eye(4), (n, 1, 1))
    c2ws[:, :3, :3] = view[:, :3, :3]      # c2w rotation (column convention)
    c2ws[:, :3, 3] = np.asarray(cams.campos)
    return c2ws


def spiral_path(session, spin_angle=5.0, n_frames=50, spin_for=2) -> list:
    """Spiral render path (reference ``export_utils.get_render_path``):
    pivot = mean mid-trajectory pose; look-at from the mean center-crop
    depth of the pivot render; growing-radius circle about the view vector.
    Returns a list of CameraArrays."""
    from deblurgs_tpu.eval.session import render_view

    spin_angle = spin_angle * np.pi / 180.0
    c2ws = middle_c2ws(session)
    pivot = mean_camera_pose(c2ws)
    up = pivot[:3, 1]
    eye = pivot[:3, 3]

    proj = jnp.asarray(session.scene.proj)
    cam_pivot = make_camera_arrays(
        c2w_to_view(jnp.asarray(pivot[:3, :3], jnp.float32),
                    jnp.asarray(eye, jnp.float32)), proj)
    _, depth = render_view(session, cam_pivot, tone_map=False)
    H, W = depth.shape
    lookat_z = float(jnp.mean(depth[H // 4:H * 3 // 4, W // 4:W * 3 // 4]))
    lookat = eye + lookat_z * pivot[:3, 2]

    dist = np.linalg.norm(eye - lookat)
    r_max = math.tan(spin_angle) * dist
    total = n_frames * spin_for
    radius = np.linspace(r_max / spin_for, r_max, total)
    theta = np.tile(np.linspace(0.0, 2 * np.pi, n_frames), spin_for)
    coords = np.stack([np.cos(theta) * radius, np.sin(theta) * radius,
                       np.zeros(total), np.ones(total)], axis=0)
    eyes = (pivot @ coords).T[:, :3]

    cams = []
    for e in eyes:
        c2w = c2w_from_eye(e, lookat, up)
        cams.append(make_camera_arrays(
            c2w_to_view(jnp.asarray(c2w[:3, :3], jnp.float32),
                        jnp.asarray(c2w[:3, 3], jnp.float32)), proj))
    return cams


def depth_colorize(depths: np.ndarray, z_near=0.01, z_far=100.0,
                   clip_percentage=1.0) -> np.ndarray:
    """jet_r depth colormap (reference ``export_utils.depth_colorize``)."""
    import matplotlib.cm

    z_near = max(z_near, float(depths.min()))
    flat = np.sort(depths.reshape(-1))
    z_far = min(z_far, float(depths.max()),
                float(flat[int((flat.size - 1) * clip_percentage)]))
    d = np.clip((depths - z_near) / max(z_far - z_near, 1e-9), 0.0, 1.0)
    cmap = matplotlib.colormaps["jet_r"]
    return (cmap(d)[..., :3] * 255).astype(np.uint8)


def make_video(imgs, path, fps=32):
    """mp4 via imageio when ffmpeg is available, else animated gif
    (reference ``export_utils.make_video``)."""
    import imageio

    try:
        writer = imageio.get_writer(path, fps=fps)
        for img in imgs:
            writer.append_data(np.asarray(img))
        writer.close()
    except Exception:
        alt = os.path.splitext(path)[0] + ".gif"
        imageio.mimsave(alt, [np.asarray(i) for i in imgs],
                        duration=1.0 / fps)
        print(f"[video] ffmpeg unavailable; wrote {alt}")


def to_uint8(img) -> np.ndarray:
    return (np.clip(np.asarray(img), 0.0, 1.0) * 255).astype(np.uint8)
