"""Data-layer tests: COLMAP binary/text parsers, PLY I/O, scene readers,
resolution policy, Gaussian snapshot roundtrip."""

import json
import math
import os
import struct

import numpy as np
import pytest

from deblurgs_tpu.data import colmap, ply
from deblurgs_tpu.data.readers import (
    get_nerfpp_norm, random_pcd_init, read_blender_scene, read_colmap_scene,
)
from deblurgs_tpu.data.scene import Scene, resolve_resolution


def write_colmap_binary(sparse_dir, n_cams=3, n_pts=50, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(sparse_dir, exist_ok=True)
    # cameras.bin: one PINHOLE camera
    with open(os.path.join(sparse_dir, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))
        f.write(struct.pack("<dddd", 60.0, 60.0, 32.0, 24.0))
    # images.bin
    with open(os.path.join(sparse_dir, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_cams))
        for i in range(n_cams):
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            if q[0] < 0:
                q = -q
            t = rng.randn(3)
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<dddd", *q))
            f.write(struct.pack("<ddd", *t))
            f.write(struct.pack("<i", 1))
            f.write(f"{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 2))
            f.write(struct.pack("<ddq", 1.0, 2.0, 7))
            f.write(struct.pack("<ddq", 3.0, 4.0, -1))
    # points3D.bin
    with open(os.path.join(sparse_dir, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_pts))
        for i in range(n_pts):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<ddd", *rng.randn(3)))
            f.write(struct.pack("<BBB", *rng.randint(0, 255, 3)))
            f.write(struct.pack("<d", rng.rand()))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 0, 0))


def write_images(img_dir, names, w=64, h=48):
    from PIL import Image

    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(1)
    for name in names:
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, name))


@pytest.fixture
def colmap_dataset(tmp_path):
    root = str(tmp_path / "scene")
    write_colmap_binary(os.path.join(root, "sparse", "0"))
    write_images(os.path.join(root, "images"), [f"{i:03d}.png" for i in range(3)])
    return root


class TestColmapParsers:
    def test_binary_roundtrip(self, colmap_dataset):
        sparse = os.path.join(colmap_dataset, "sparse", "0")
        cams = colmap.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
        assert cams[1].model == "PINHOLE"
        assert cams[1].width == 64
        np.testing.assert_allclose(cams[1].params, [60, 60, 32, 24])

        imgs = colmap.read_images_binary(os.path.join(sparse, "images.bin"))
        assert len(imgs) == 3
        assert imgs[1].name == "000.png"
        assert imgs[1].xys.shape == (2, 2)
        np.testing.assert_allclose(imgs[1].xys[0], [1.0, 2.0])
        assert imgs[1].point3D_ids[1] == -1

        xyz, rgb, err = colmap.read_points3d_binary(
            os.path.join(sparse, "points3D.bin"))
        assert xyz.shape == (50, 3) and rgb.dtype == np.uint8

    def test_text_roundtrip(self, tmp_path, colmap_dataset):
        sparse = os.path.join(colmap_dataset, "sparse", "0")
        cams = colmap.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
        imgs = colmap.read_images_binary(os.path.join(sparse, "images.bin"))
        colmap.write_cameras_text(cams, str(tmp_path / "cameras.txt"))
        colmap.write_images_text(imgs, str(tmp_path / "images.txt"))
        cams2 = colmap.read_cameras_text(str(tmp_path / "cameras.txt"))
        imgs2 = colmap.read_images_text(str(tmp_path / "images.txt"))
        np.testing.assert_allclose(cams2[1].params, cams[1].params)
        np.testing.assert_allclose(imgs2[2].qvec, imgs[2].qvec, rtol=1e-6)
        np.testing.assert_allclose(imgs2[2].tvec, imgs[2].tvec, rtol=1e-6)

    def test_qvec_rotmat_roundtrip(self):
        rng = np.random.RandomState(3)
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = colmap.qvec2rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(colmap.rotmat2qvec(R), q, atol=1e-8)


class TestPly:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "t.ply")
        xyz = np.random.RandomState(0).randn(10, 3).astype(np.float32)
        rgb = np.random.RandomState(1).randint(0, 255, (10, 3))
        ply.store_point_cloud(path, xyz, rgb)
        pts, cols, normals = ply.fetch_point_cloud(path)
        np.testing.assert_allclose(pts, xyz, rtol=1e-6)
        np.testing.assert_allclose(cols * 255, rgb, atol=0.5)

    def test_gaussian_ply_roundtrip(self, tmp_path):
        import jax
        from deblurgs_tpu.data.gaussian_ply import (
            load_gaussian_ply, save_gaussian_ply,
        )
        from deblurgs_tpu.models import gaussians as gm

        cfg = gm.GaussianConfig(sh_degree=2)
        pts = jax.random.normal(jax.random.PRNGKey(0), (20, 3))
        import jax.numpy as jnp

        cols = jnp.full((20, 3), 0.4)
        params, aux = gm.create_from_pcd(pts, cols, cfg, capacity=32)
        path = str(tmp_path / "pc" / "point_cloud.ply")
        save_gaussian_ply(path, params, aux, cfg)
        p2, a2 = load_gaussian_ply(path, cfg, capacity=32)
        assert int(gm.num_active(a2)) == 20
        # activated quantities roundtrip (raw params may differ through the
        # disk sigmoid/log re-encoding)
        np.testing.assert_allclose(
            np.asarray(gm.get_opacity(p2, cfg))[:20],
            np.asarray(gm.get_opacity(params, cfg))[:20], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(gm.get_scaling(p2, cfg))[:20],
            np.asarray(gm.get_scaling(params, cfg))[:20], rtol=1e-4)
        np.testing.assert_allclose(np.asarray(p2.xyz)[:20],
                                   np.asarray(params.xyz)[:20], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(p2.f_rest)[:20],
                                   np.asarray(params.f_rest)[:20], atol=1e-7)


class TestReaders:
    def test_colmap_scene(self, colmap_dataset):
        info = read_colmap_scene(colmap_dataset)
        assert len(info.train_cameras) == 3
        assert len(info.test_cameras) == 0
        assert info.point_cloud.points.shape == (50, 3)
        assert info.nerf_normalization["radius"] > 0
        c = info.train_cameras[0]
        assert c.width == 64 and c.height == 48
        # fov from focal 60 px
        assert abs(c.FovX - 2 * math.atan(32 / 60)) < 1e-6

    def test_llffhold_marker(self, colmap_dataset):
        open(os.path.join(colmap_dataset, "hold=2"), "w").close()
        info = read_colmap_scene(colmap_dataset, eval_split=True)
        names = [c.image_name for c in info.test_cameras]
        assert names == ["000", "002"]
        assert [c.image_name for c in info.train_cameras] == ["001"]

    def test_num_initial_pcd_prunes(self, colmap_dataset):
        info = read_colmap_scene(colmap_dataset, num_initial_pcd=20)
        assert info.point_cloud.points.shape[0] <= 21

    def test_random_init(self, colmap_dataset):
        info = read_colmap_scene(colmap_dataset, random_init=True)
        assert info.point_cloud.points.shape[0] > 1000

    def test_blender_scene(self, tmp_path):
        root = str(tmp_path / "blender")
        os.makedirs(os.path.join(root, "train"))
        write_images(os.path.join(root, "train"),
                     ["r_0.png", "r_1.png"], w=32, h=32)
        frames = []
        rng = np.random.RandomState(0)
        for i in range(2):
            c2w = np.eye(4)
            c2w[:3, 3] = rng.randn(3) + [0, 0, 4]
            frames.append({"file_path": f"train/r_{i}",
                           "transform_matrix": c2w.tolist()})
        json.dump({"camera_angle_x": 0.8, "frames": frames},
                  open(os.path.join(root, "transforms_train.json"), "w"))
        info = read_blender_scene(root)
        assert len(info.train_cameras) == 2
        assert info.point_cloud.points.shape[0] > 1000


class TestScene:
    def test_resolution_policy(self):
        assert resolve_resolution(1600, 1200, 1) == (1600, 1200)
        assert resolve_resolution(1600, 1200, 2) == (800, 600)
        assert resolve_resolution(3200, 2400, -1) == (1600, 1200)
        assert resolve_resolution(800, 600, -1) == (800, 600)
        assert resolve_resolution(800, 600, 400) == (400, 300)

    def test_scene_assembly(self, colmap_dataset, tmp_path):
        model = str(tmp_path / "model")
        scene = Scene(colmap_dataset, model, resolution=1)
        assert scene.train_images.shape == (3, 48, 64, 3)
        assert scene.rotations.shape == (3, 3, 3)
        assert scene.camera_static.width == 64
        assert os.path.exists(os.path.join(model, "input.ply"))
        assert os.path.exists(os.path.join(model, "cameras.json"))
        # iterator covers all cams each epoch
        seen = {scene.get_random_cam_idx() for _ in range(3)}
        assert seen == {0, 1, 2}


class TestVisualizeColmap:
    def test_sparse_viz(self, colmap_dataset, tmp_path):
        from deblurgs_tpu.cli.visualize_colmap import visualize

        out = visualize(colmap_dataset, str(tmp_path / "viz.png"))
        assert os.path.exists(out)
