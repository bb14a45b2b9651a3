"""Full-CLI user journey on a RENDERABLE synthetic COLMAP workspace.

``test_loop.py::test_cli_end_to_end`` exercises the train CLI's artifact
contract on noise images; this module closes the remaining reference user
journey (reference ``train.py:249-285`` → ``test.py:401-439``): a dataset
whose images are actual renders of a known Gaussian scene, trained with an
LLFF-hold eval split, then scored by ``cli/evaluate.py`` (held-out views,
iNeRF pose refinement, ``eval.txt``) — asserting the reconstruction is
real (PSNR floor), not just that files appear.
"""

import math
import os
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblurgs_tpu.core import camera as cam_lib
from deblurgs_tpu.core import lie
from deblurgs_tpu.data import colmap

W, H = 64, 48
FOVX = 1.1
N_CAMS = 6


def _ring_poses(n=N_CAMS, dist=4.0):
    """c2w rotations + camera centers on a partial ring looking at origin."""
    rots, centers = [], []
    for i in range(n):
        ang = 2 * math.pi * i / n * 0.18
        rot = np.asarray(
            lie.so3_exp_map(jnp.array([[0.1 * math.sin(ang), ang, 0.0]]))[0])
        rots.append(rot)
        centers.append(rot @ np.array([0.0, 0.0, -dist]))
    return np.stack(rots), np.stack(centers)


def _true_scene(key, n_fg=120):
    """Foreground splats + an opaque backdrop wall (random-background
    training only converges when the scene occludes every pixel)."""
    ks = jax.random.split(key, 5)
    fg = jax.random.normal(ks[0], (n_fg, 3)) * 0.8
    side = 10
    gx, gy = jnp.meshgrid(jnp.linspace(-4, 4, side), jnp.linspace(-4, 4, side))
    wall = jnp.stack([gx.ravel(), gy.ravel(), jnp.full(side * side, 2.5)], -1)
    means = jnp.concatenate([fg, wall])
    n = means.shape[0]
    scales = jnp.concatenate([
        jnp.full((n_fg, 3), 0.08),
        jnp.full((side * side, 3), 0.55),
    ])
    rotations = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    opacities = jnp.full((n,), 0.9)
    shs = jax.random.uniform(ks[1], (n, 1, 3), minval=-1.2, maxval=1.2)
    return means, scales, rotations, opacities, shs


def build_renderable_workspace(root):
    """COLMAP workspace whose images are tone-mapped renders of a known
    scene, with points3D seeded at the true splat centers."""
    from deblurgs_tpu.eval.pose_opt import PoseParams, pose_to_camera
    from deblurgs_tpu.models.motion import _rotmat_to_quat
    from deblurgs_tpu.models.tonemap import tone_map
    from deblurgs_tpu.ops.rasterize import RasterizeConfig, render

    rots, centers = _ring_poses()
    means, scales, rotations, opacities, shs = _true_scene(
        jax.random.PRNGKey(7))

    sparse = os.path.join(root, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)

    fx = cam_lib.fov2focal(FOVX, W)
    fovy = 2 * math.atan(math.tan(FOVX / 2) * H / W)
    fy = cam_lib.fov2focal(fovy, H)
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, W, H))
        f.write(struct.pack("<dddd", fx, fy, W / 2, H / 2))

    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", N_CAMS))
        for i in range(N_CAMS):
            r_w2c = rots[i].T
            tvec = -r_w2c @ centers[i]
            qvec = colmap.rotmat2qvec(r_w2c)
            if qvec[0] < 0:
                qvec = -qvec
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<dddd", *qvec))
            f.write(struct.pack("<ddd", *tvec))
            f.write(struct.pack("<i", 1))
            f.write(f"{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))

    # points3D at the true centers (the reference initializes from the
    # COLMAP triangulation; colors = the deg-0 SH converted back to RGB)
    rgb = np.clip(np.asarray(shs[:, 0]) * 0.28209479 + 0.5, 0, 1)
    xyz = np.asarray(means)
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", xyz.shape[0]))
        for i in range(xyz.shape[0]):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<ddd", *xyz[i]))
            f.write(struct.pack("<BBB", *(rgb[i] * 255).astype(np.uint8)))
            f.write(struct.pack("<d", 0.1))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 0, 0))

    # GT images through the SAME camera convention the eval path uses
    cs = cam_lib.CameraStatic(width=W, height=H,
                              tanfovx=math.tan(FOVX / 2),
                              tanfovy=math.tan(fovy / 2),
                              znear=0.01, zfar=100.0)
    proj = cam_lib.get_projection_matrix(0.01, 100.0, FOVX, fovy)
    rcfg = RasterizeConfig(backend="xla", max_pairs=1 << 14)
    pose = PoseParams(
        quat=_rotmat_to_quat(jnp.asarray(rots, jnp.float32)),
        trans=jnp.asarray(
            np.stack([-rots[i].T @ centers[i] for i in range(N_CAMS)]),
            jnp.float32))

    from PIL import Image

    @jax.jit
    def render_one(i):
        cam = pose_to_camera(pose, i, proj)
        out = render(means, scales, rotations, opacities, shs, cam, cs,
                     jnp.zeros(3), cfg=rcfg, sh_degree=0)
        return tone_map(jnp.clip(out.image, 0, 1), "gamma")

    for i in range(N_CAMS):
        img = np.asarray(render_one(jnp.int32(i)))
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(img_dir, f"{i:03d}.png"))
    return root


@pytest.mark.slow
def test_train_then_evaluate_user_journey(tmp_path):
    source = build_renderable_workspace(str(tmp_path / "scene"))
    model = str(tmp_path / "model")

    from deblurgs_tpu.cli.train import main as train_main

    state = train_main([
        "-s", source, "-m", model,
        "--iterations", "150",
        "--backend", "xla",
        "--max_pairs", str(1 << 14),
        "--num_subframes", "3",
        "--curve_order", "2",
        "--curve_start_iter", "60",
        "--curve_end_iter", "120",
        "--densify_from_iter", "1000000",
        "--opacity_reset_interval", "1000000",
        "--eval", "--llffhold", "3",
        "--checkpoint_iterations", "100",
        "--save_iterations", "150",
        "--skip_final_render",
    ])
    assert np.isfinite(float(state.step))
    assert os.path.exists(os.path.join(model, "chkpnt100.npz"))
    assert os.path.exists(os.path.join(
        model, "point_cloud", "iteration_150", "point_cloud.ply"))
    # default-on training visualization (reference train.py:76,218-225):
    # overview shots -> vis/training.mp4 (gif fallback without ffmpeg)
    assert any(os.path.exists(os.path.join(model, "vis", f"training.{ext}"))
               for ext in ("mp4", "gif")), "no training overview video"

    # held-out evaluation (reference test.py protocol: unfit → pose
    # refinement → fit → eval.txt). llffhold=3 holds out cams 0 and 3.
    from deblurgs_tpu.cli.evaluate import main as eval_main

    results = eval_main([
        "-m", model, "-s", source,
        "--num_iter_per_view", "25",
    ])
    assert results is not None and "fit" in results
    for split in ("unfit", "fit"):
        assert np.isfinite(results[split]["PSNR"])
        assert 0.0 <= results[split]["SSIM"] <= 1.0
    # the scene init sits at the true centers with true colors: 150 iters
    # must beat a blind reconstruction by a wide margin (noise images score
    # ~7-9 dB at this resolution)
    assert results["fit"]["PSNR"] > 12.0, results
    # pose refinement must not make the score (meaningfully) worse
    assert results["fit"]["PSNR"] >= results["unfit"]["PSNR"] - 0.25
    assert os.path.exists(os.path.join(model, "eval.txt"))
    assert os.path.exists(
        os.path.join(model, "test", "fit", "renders", "000.png"))
    assert os.path.exists(
        os.path.join(model, "test", "fit", "error", "001.png"))
    with open(os.path.join(model, "eval.txt")) as f:
        txt = f.read()
    assert "unfit" in txt and "fit" in txt
