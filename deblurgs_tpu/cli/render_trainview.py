"""Sharp train-view vs GT side-by-side export — reference ``render_trainview.py``:
renders each image's mid-trajectory (deblurred) camera next to its blurry
ground truth."""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

import jax.numpy as jnp
import numpy as np


def render_sets(model_path: str, source_path: str | None = None,
                load_iteration: int = -1, resolution: int | None = None,
                backend: str | None = None):
    from deblurgs_tpu.eval import export
    from deblurgs_tpu.eval.session import load_session, render_view
    from deblurgs_tpu.models import motion as motion_lib

    session = load_session(model_path, source_path,
                           load_iteration=load_iteration,
                           resolution=resolution, backend=backend)
    cams = motion_lib.middle_cameras(session.motion,
                                     jnp.asarray(session.scene.proj),
                                     session.mcfg)
    n = session.scene.num_train
    frames = []
    out_dir = os.path.join(model_path, "trainview",
                           f"iteration_{session.iteration}")
    os.makedirs(out_dir, exist_ok=True)
    import imageio

    for i in range(n):
        cam_i = type(cams)(*[leaf[i] for leaf in cams])
        img, _ = render_view(session, cam_i)
        gt = session.scene.train_images[i]
        side = np.concatenate([export.to_uint8(img), export.to_uint8(gt)],
                              axis=1)
        frames.append(side)
        imageio.imwrite(os.path.join(out_dir, f"{i:03d}.png"), side)
    export.make_video(frames, os.path.join(out_dir, "trainview.mp4"), fps=8)
    print(f"wrote {out_dir}")
    return out_dir


def main(argv=None):
    from deblurgs_tpu.cli.args import apply_platform_env
    apply_platform_env()
    parser = ArgumentParser()
    parser.add_argument("--model_path", "-m", type=str, required=True)
    parser.add_argument("--source_path", "-s", type=str, default=None)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--resolution", "-r", type=int, default=None)
    parser.add_argument("--backend", type=str, default=None)
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    return render_sets(args.model_path, args.source_path, args.iteration,
                       args.resolution, args.backend)


if __name__ == "__main__":
    main()
