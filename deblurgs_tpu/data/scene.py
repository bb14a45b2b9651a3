"""Scene assembly: dataset → device-ready training tensors + session state.

Reference counterpart: ``scene/__init__.py`` (class Scene) +
``utils/camera_utils.py`` (resolution policy) — dataset-type dispatch,
model-dir artifacts (``input.ply``, ``cameras.json``), resolution-scaled
camera/image loading, epoch-style shuffled camera iterator, Gaussian
snapshot save/load.

TPU-shape note: all training images are stacked into one [n, H, W, 3]
float32 array (cameras in a scene share a resolution after the policy), so
``gts[idx]`` feeds the jitted train step with a static shape.
"""

from __future__ import annotations

import json
import math
import os
import random
import re

import numpy as np

from deblurgs_tpu.core.camera import (
    CameraStatic, fov2focal, get_projection_matrix,
)
from deblurgs_tpu.data.readers import SceneInfo, load_scene_info


def resolve_resolution(orig_w: int, orig_h: int, resolution: int,
                       resolution_scale: float = 1.0):
    """Reference ``loadCam`` policy (``camera_utils.py:21-58``): divisor
    {1,2,4,8}, target width, or auto-downscale above 1600 px."""
    if resolution in (1, 2, 4, 8):
        return (round(orig_w / (resolution_scale * resolution)),
                round(orig_h / (resolution_scale * resolution)))
    if resolution == -1:
        global_down = orig_w / 1600 if orig_w > 1600 else 1
    else:
        global_down = orig_w / resolution
    scale = float(global_down) * float(resolution_scale)
    return int(orig_w / scale), int(orig_h / scale)


def load_image(cam_info, resolution: int, resolution_scale: float = 1.0):
    """PIL → float [H, W, 3] with alpha-mask multiply (reference ``loadCam``)."""
    w, h = resolve_resolution(cam_info.width, cam_info.height,
                              resolution, resolution_scale)
    img = cam_info.image.resize((w, h))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None].repeat(3, axis=-1)
    if arr.shape[-1] == 4:
        arr = arr[..., :3] * arr[..., 3:4]
    return np.clip(arr[..., :3], 0.0, 1.0)


def camera_to_json(uid, cam_info):
    """Reference ``camera_to_JSON`` (``camera_utils.py:68-88``)."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = cam_info.R.transpose()
    Rt[:3, 3] = cam_info.T
    Rt[3, 3] = 1.0
    W2C = np.linalg.inv(Rt)
    return {
        "id": uid,
        "img_name": cam_info.image_name,
        "width": cam_info.width,
        "height": cam_info.height,
        "position": W2C[:3, 3].tolist(),
        "rotation": [r.tolist() for r in W2C[:3, :3]],
        "fy": fov2focal(cam_info.FovY, cam_info.height),
        "fx": fov2focal(cam_info.FovX, cam_info.width),
    }


class Scene:
    """Host-side scene session.

    Holds numpy training data + hyperparameters; the caller moves tensors to
    device (see ``train/loop.py``). ``znear=0.01, zfar=100`` as the reference
    ``Camera`` (``cameras.py:51-52``).
    """

    def __init__(self, source_path: str, model_path: str | None = None, *,
                 images: str = "images", resolution: int = -1,
                 eval_split: bool = False, llffhold: int = 0,
                 num_initial_pcd: int = -1, random_init: bool = False,
                 white_background: bool = False,
                 z_near: float = 0.2, z_far: float = 100.0,
                 use_sigmoid: bool = False, shuffle: bool = True, seed: int = 0,
                 load_indices=None):
        self.model_path = model_path
        self.white_background = white_background
        self.info: SceneInfo = load_scene_info(
            source_path, images=images, eval_split=eval_split,
            llffhold=llffhold, num_initial_pcd=num_initial_pcd,
            random_init=random_init, z_near=z_near, z_far=z_far,
            use_sigmoid=use_sigmoid, white_background=white_background,
        )
        self.cameras_extent = self.info.nerf_normalization["radius"]

        if model_path:
            os.makedirs(model_path, exist_ok=True)
            import shutil

            shutil.copyfile(self.info.ply_path,
                            os.path.join(model_path, "input.ply"))
            cams = list(self.info.test_cameras) + list(self.info.train_cameras)
            with open(os.path.join(model_path, "cameras.json"), "w") as f:
                json.dump([camera_to_json(i, c) for i, c in enumerate(cams)], f)

        # resolution-scaled image stack. In multi-host runs each process
        # decodes only its own camera shard (parallel/multihost.py
        # host_local_camera_split); other rows stay zero and are never read
        # from this process (the global array's shard lives on its owner).
        first = load_image(self.info.train_cameras[0], resolution)
        n_train = len(self.info.train_cameras)
        if load_indices is None:
            load_indices = range(n_train)
        self.train_images = np.zeros((n_train,) + first.shape, first.dtype)
        for i in load_indices:
            self.train_images[i] = (first if i == 0 else load_image(
                self.info.train_cameras[i], resolution))
        self.height, self.width = self.train_images.shape[1:3]

        c0 = self.info.train_cameras[0]
        self.camera_static = CameraStatic(
            width=self.width, height=self.height,
            tanfovx=math.tan(c0.FovX * 0.5), tanfovy=math.tan(c0.FovY * 0.5),
            znear=0.01, zfar=100.0,
        )
        self.proj = get_projection_matrix(0.01, 100.0, c0.FovX, c0.FovY)

        # c2w rotations + camera centers for the motion module init
        self.rotations = np.stack([c.R for c in self.info.train_cameras])
        self.centers = np.stack([-c.T @ c.R.T for c in self.info.train_cameras])

        self._rng = random.Random(seed)
        self._order: list[int] = []
        self.shuffle = shuffle

    @property
    def num_train(self) -> int:
        return len(self.info.train_cameras)

    def get_random_cam_idx(self) -> int:
        """Epoch-style shuffled iterator (reference ``scene/__init__.py:120-129``)."""
        if not self._order:
            self._order = list(range(self.num_train))
            if self.shuffle:
                self._rng.shuffle(self._order)
        return self._order.pop()

    def point_cloud_dir(self, iteration: int) -> str:
        return os.path.join(self.model_path, "point_cloud",
                            f"iteration_{iteration}")

    @staticmethod
    def search_max_iteration(point_cloud_dir: str) -> int:
        """Reference ``searchForMaxIteration`` (``system_utils.py:27-29``)."""
        iters = [int(re.sub(r"[^0-9]", "", f))
                 for f in os.listdir(point_cloud_dir)]
        return max(iters)
