"""Training observability — reference ``utils/visualization.py`` (Visualizer).

Artifacts, mirroring the reference's set:
- ``run(iteration)``: scene overview from an auto-found zoom-out camera
  (binary search over camera distance until every train camera projects
  inside the frame) with the per-image sub-frame trajectory drawn as
  projected camera points (``:83-189``) — captured at x^1.7-spaced shots;
- ``visualize_alignment``: 3×3 scatter grid of the ν shutter positions
  (``:218-253``);
- ``traj_render(iteration)``: blur / sub-frame / error-map dumps for one
  training view (``:262-291``);
- ``save_video()``: stitches the overview shots (``:296-309``).
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from deblurgs_tpu.core.camera import c2w_to_view, make_camera_arrays
from deblurgs_tpu.models import gaussians as gm
from deblurgs_tpu.models import motion as motion_lib
from deblurgs_tpu.ops.rasterize import render


class Visualizer:
    def __init__(self, scene, gcfg, mcfg, rcfg, model_path: str,
                 total_iterations: int, n_shots: int = 200,
                 sh_degree: int | None = None,
                 vis_cam_idx: int | None = None):
        self.scene = scene
        self.gcfg, self.mcfg, self.rcfg = gcfg, mcfg, rcfg
        self.model_path = model_path
        # reference ``--vis_cam_idx``: focus the overview on this camera's
        # nominal pose instead of the auto zoom-out search (train.py:267)
        self.vis_cam_idx = vis_cam_idx
        self.vis_dir = os.path.join(model_path, "vis")
        os.makedirs(self.vis_dir, exist_ok=True)
        # x^1.7-spaced shot schedule (reference ``:76-81``)
        xs = np.linspace(0, 1, n_shots) ** 1.7
        self.shot_iters = sorted(set((xs * total_iterations).astype(int).tolist()))
        self.frames: list = []
        self._vis_cam = None
        self.sh_degree = sh_degree if sh_degree is not None else gcfg.sh_degree
        self.camera_scale = 0.5  # frustum-cone size (reference `:134-135`)

    # -- zoom-out camera search (reference ``_get_visualization_camera``)
    def _get_vis_camera(self):
        if self._vis_cam is not None:
            return self._vis_cam
        if self.vis_cam_idx is not None:
            i = self.vis_cam_idx
            self._vis_cam = make_camera_arrays(
                c2w_to_view(jnp.asarray(self.scene.rotations[i], jnp.float32),
                            jnp.asarray(self.scene.centers[i], jnp.float32)),
                jnp.asarray(self.scene.proj))
            return self._vis_cam
        centers = np.asarray(self.scene.centers)
        mean_center = centers.mean(axis=0)
        # look along the mean camera forward axis, pulled back until all
        # camera centers project inside the frame
        from deblurgs_tpu.eval.export import c2w_from_eye, mean_camera_pose

        c2ws = np.tile(np.eye(4), (len(centers), 1, 1))
        c2ws[:, :3, :3] = self.scene.rotations
        c2ws[:, :3, 3] = centers
        pivot = mean_camera_pose(c2ws)
        back = pivot[:3, 2]
        proj = jnp.asarray(self.scene.proj)

        lo, hi = 0.1, 100.0
        chosen = None
        for _ in range(20):
            mid = 0.5 * (lo + hi)
            eye = mean_center - back * mid
            c2w = c2w_from_eye(eye, mean_center, pivot[:3, 1])
            cam = make_camera_arrays(
                c2w_to_view(jnp.asarray(c2w[:3, :3], jnp.float32),
                            jnp.asarray(c2w[:3, 3], jnp.float32)), proj)
            uv, ok = self._project(cam, centers)
            if ok:
                chosen = cam
                hi = mid
            else:
                lo = mid
        self._vis_cam = chosen or cam
        return self._vis_cam

    def _project(self, cam, pts):
        """Project world points; (pixel uv [n,2], all-in-frame bool)."""
        cs = self.scene.camera_static
        hom = jnp.concatenate(
            [jnp.asarray(pts, jnp.float32),
             jnp.ones((len(pts), 1), jnp.float32)], axis=-1)
        clip = hom @ cam.full_proj
        w = clip[:, 3:4] + 1e-7
        ndc = clip[:, :2] / w
        u = ((ndc[:, 0] + 1) * cs.width - 1) * 0.5
        v = ((ndc[:, 1] + 1) * cs.height - 1) * 0.5
        in_frame = bool(jnp.all((clip[:, 3] > 0)
                                & (u >= 0) & (u < cs.width)
                                & (v >= 0) & (v < cs.height)))
        return np.stack([np.asarray(u), np.asarray(v)], -1), in_frame

    def run(self, iteration: int, state) -> Optional[np.ndarray]:
        """Capture an overview shot if this iteration is scheduled."""
        if iteration not in self.shot_iters:
            return None
        import cv2

        cam = self._get_vis_camera()
        rin = gm.render_inputs(state.params, self.gcfg)
        out = render(rin["means3d"], rin["scales"], rin["rotations"],
                     rin["opacities"], rin["shs"], cam,
                     self.scene.camera_static, jnp.zeros(3),
                     cfg=self.rcfg, sh_degree=self.sh_degree,
                     active=state.aux.active)
        img = (np.clip(np.asarray(out.image), 0, 1) * 255).astype(np.uint8).copy()

        # draw each image's sub-frame trajectory as camera FRUSTUM CONES
        # (reference draw_cone_on_render_img, visualization.py:137-189:
        # apex + 4 image-plane corners at ±tan(fov/2), connected 8 ways)
        n = self.scene.num_train
        cs = self.scene.camera_static
        cone_local = np.array([
            [0.0, 0.0, 0.0],
            [cs.tanfovx, cs.tanfovy, 1.0],
            [cs.tanfovx, -cs.tanfovy, 1.0],
            [-cs.tanfovx, -cs.tanfovy, 1.0],
            [-cs.tanfovx, cs.tanfovy, 1.0],
        ]) * self.camera_scale                                    # [5, 3]
        connectivity = [(0, 1), (0, 2), (0, 3), (0, 4),
                        (1, 2), (2, 3), (3, 4), (4, 1)]
        for i in range(n):
            nu = motion_lib.sample_nu(state.motion, i, self.mcfg)
            rots, centers = motion_lib.sample_c2w(state.motion, i, nu,
                                                  self.mcfg)
            rots = np.asarray(rots)
            centers = np.asarray(centers)
            color = tuple(int(c) for c in np.random.RandomState(i).randint(
                64, 255, 3))
            for r, c in zip(rots, centers):
                world = cone_local @ r.T + c                      # [5, 3]
                uv, _ = self._project(cam, world)
                # skip cones behind the viewing camera (reference :176-177)
                hom = np.concatenate([world, np.ones((5, 1))], -1)
                zview = (hom @ np.asarray(cam.view))[:, 2]
                if np.any(zview < 0.1):
                    continue
                pix = uv.astype(int)
                for a, b in connectivity:
                    cv2.line(img, tuple(pix[a]), tuple(pix[b]), color, 1)
        cv2.putText(img, f"it {iteration}", (8, 20),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255), 1)
        self.frames.append(img)
        return img

    def visualize_alignment(self, iteration: int, state):
        """3×3 ν scatter grid (reference ``visualize_alignment``)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = min(9, state.motion.nu.shape[0])
        fig, axes = plt.subplots(3, 3, figsize=(9, 9))
        for i in range(9):
            ax = axes[i // 3][i % 3]
            if i < n:
                nu = np.asarray(motion_lib.sample_nu(state.motion, i, self.mcfg))
                ax.scatter(nu, np.zeros_like(nu), s=8)
                ax.set_xlim(-0.05, 1.05)
                ax.set_title(f"cam {i}", fontsize=8)
            ax.set_yticks([])
        path = os.path.join(self.vis_dir, f"alignment_{iteration:06d}.png")
        fig.savefig(path, dpi=80)
        plt.close(fig)
        return path

    def traj_render(self, iteration: int, state, cam_idx: int = 0):
        """Blur / sub-frames / error dumps for one view (reference
        ``traj_render``)."""
        import imageio

        proj = jnp.asarray(self.scene.proj)
        nu = motion_lib.sample_nu(state.motion, cam_idx, self.mcfg)
        cams = motion_lib.subframe_cameras(state.motion, cam_idx, nu, proj,
                                           self.mcfg)
        rin = gm.render_inputs(state.params, self.gcfg)
        imgs = []
        for i in range(self.mcfg.n_subframes):
            cam_i = type(cams)(*[leaf[i] for leaf in cams])
            out = render(rin["means3d"], rin["scales"], rin["rotations"],
                         rin["opacities"], rin["shs"], cam_i,
                         self.scene.camera_static, jnp.zeros(3),
                         cfg=self.rcfg, sh_degree=self.sh_degree,
                         active=state.aux.active)
            imgs.append(np.asarray(out.image))
        blur = np.mean(imgs, axis=0)
        gt = self.scene.train_images[cam_idx]
        err = np.abs(blur - gt).mean(-1)

        out_dir = os.path.join(self.vis_dir, f"traj_{iteration:06d}")
        os.makedirs(out_dir, exist_ok=True)
        to8 = lambda x: (np.clip(x, 0, 1) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(out_dir, "blur.png"), to8(blur))
        imageio.imwrite(os.path.join(out_dir, "gt.png"), to8(gt))

        import matplotlib

        cmap = matplotlib.colormaps["jet"]
        imageio.imwrite(os.path.join(out_dir, "error.png"),
                        to8(cmap(np.clip(err * 4, 0, 1))[..., :3]))
        for i in (0, len(imgs) // 2, len(imgs) - 1):
            imageio.imwrite(os.path.join(out_dir, f"subframe_{i:02d}.png"),
                            to8(imgs[i]))
        return out_dir

    def save_video(self):
        if not self.frames:
            return None
        from deblurgs_tpu.eval.export import make_video

        path = os.path.join(self.vis_dir, "training.mp4")
        make_video(self.frames, path, fps=16)
        return path
