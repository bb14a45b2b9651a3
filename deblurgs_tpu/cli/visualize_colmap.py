"""Sparse-model visualization — reference ``scripts/colmap_visualization.py``.

The reference renders the reconstruction with open3d (not available here);
this writes a matplotlib 3-D scatter of the point cloud + camera frusta and
a combined PLY instead.
"""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

import numpy as np


def visualize(workspace: str, out_path: str | None = None):
    from deblurgs_tpu.data import colmap, ply

    sparse = colmap.detect_sparse_dir(workspace) or workspace
    try:
        xyz, rgb, _ = colmap.read_points3d_binary(
            os.path.join(sparse, "points3D.bin"))
    except FileNotFoundError:
        xyz, rgb, _ = colmap.read_points3d_text(
            os.path.join(sparse, "points3D.txt"))
    try:
        images = colmap.read_images_binary(os.path.join(sparse, "images.bin"))
    except FileNotFoundError:
        images = colmap.read_images_text(os.path.join(sparse, "images.txt"))

    centers = []
    for img in images.values():
        R = colmap.qvec2rotmat(img.qvec)
        centers.append(-R.T @ np.asarray(img.tvec))
    centers = np.stack(centers) if centers else np.zeros((0, 3))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    sub = xyz[:: max(len(xyz) // 20000, 1)]
    subc = rgb[:: max(len(xyz) // 20000, 1)] / 255.0
    ax.scatter(sub[:, 0], sub[:, 1], sub[:, 2], c=subc, s=0.5)
    if len(centers):
        ax.scatter(centers[:, 0], centers[:, 1], centers[:, 2],
                   c="red", marker="^", s=30, label="cameras")
        ax.legend()
    out_path = out_path or os.path.join(workspace, "sparse_viz.png")
    fig.savefig(out_path, dpi=110)
    plt.close(fig)

    ply.store_point_cloud(os.path.join(workspace, "sparse_viz.ply"), xyz, rgb)
    print(f"wrote {out_path}")
    return out_path


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--path", type=str, required=True)
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    return visualize(args.path, args.out)


if __name__ == "__main__":
    main()
