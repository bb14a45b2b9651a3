"""Held-out evaluation driver — reference ``test.py:401-439``.

Pipeline: load trained session → (optionally) COLMAP-register unknown test
poses (``tools/colmap_pipeline.py``; requires the colmap binary) →
evaluate with the raw poses ("unfit") → iNeRF pose refinement
(``eval/pose_opt.py``) → evaluate again ("fit") → ``eval.txt``.
"""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

import jax.numpy as jnp
import numpy as np


def evaluate_session(session, pose_params, gts, proj, out_dir=None,
                     lpips=None):
    from deblurgs_tpu.eval import export
    from deblurgs_tpu.eval import metrics as m
    from deblurgs_tpu.eval.pose_opt import pose_to_camera
    from deblurgs_tpu.eval.session import render_view

    renders = []
    n = pose_params.quat.shape[0]
    for i in range(n):
        cam = pose_to_camera(pose_params, i, proj)
        img, _ = render_view(session, cam)
        renders.append(np.asarray(img))
        if out_dir:
            import imageio

            os.makedirs(os.path.join(out_dir, "renders"), exist_ok=True)
            os.makedirs(os.path.join(out_dir, "gt"), exist_ok=True)
            imageio.imwrite(os.path.join(out_dir, "renders", f"{i:03d}.png"),
                            export.to_uint8(img))
            imageio.imwrite(os.path.join(out_dir, "gt", f"{i:03d}.png"),
                            export.to_uint8(gts[i]))
            err = np.abs(np.asarray(img) - np.asarray(gts[i])).mean(-1)
            os.makedirs(os.path.join(out_dir, "error"), exist_ok=True)
            import matplotlib

            cmap = matplotlib.colormaps["jet"]
            imageio.imwrite(
                os.path.join(out_dir, "error", f"{i:03d}.png"),
                (cmap(np.clip(err * 4, 0, 1))[..., :3] * 255).astype(np.uint8))
    return m.evaluate_pairs(renders, list(np.asarray(gts)), lpips)


def main(argv=None):
    from deblurgs_tpu.cli.args import apply_platform_env
    apply_platform_env()
    parser = ArgumentParser()
    parser.add_argument("--model_path", "-m", type=str, required=True)
    parser.add_argument("--source_path", "-s", type=str, default=None)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--num_iter_per_view", type=int, default=2000)
    parser.add_argument("--skip_pose_opt", action="store_true")
    parser.add_argument("--lpips_weights", type=str, default=None)
    parser.add_argument("--backend", type=str, default=None)
    parser.add_argument("--resolution", "-r", type=int, default=None)
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])

    from deblurgs_tpu.eval import metrics as m
    from deblurgs_tpu.eval.pose_opt import init_pose_params, optimize_test_poses
    from deblurgs_tpu.eval.session import load_session
    from deblurgs_tpu.data.scene import load_image

    session = load_session(args.model_path, args.source_path,
                           load_iteration=args.iteration,
                           resolution=args.resolution, backend=args.backend)
    test_infos = session.scene.info.test_cameras
    if not test_infos:
        # no held-out split: try COLMAP registration of test_images/
        from deblurgs_tpu.tools.colmap_pipeline import initialize_test_pose

        try:
            test_infos = initialize_test_pose(session, args.model_path,
                                              args.source_path)
        except RuntimeError as e:
            print(f"cannot register test poses: {e}")
            test_infos = []
        if not test_infos:
            print("no test cameras available — nothing to evaluate")
            return None

    gts = jnp.asarray(np.stack([
        load_image(c, args.resolution if args.resolution is not None else -1)
        for c in test_infos
    ]))
    rotations = np.stack([c.R for c in test_infos])
    translations = np.stack([c.T for c in test_infos])
    proj = jnp.asarray(session.scene.proj)
    lpips = m.LPIPS.from_file(args.lpips_weights)

    pose = init_pose_params(jnp.asarray(rotations, jnp.float32),
                            jnp.asarray(translations, jnp.float32))
    agg_unfit, _ = evaluate_session(
        session, pose, gts, proj,
        out_dir=os.path.join(args.model_path, "test", "unfit"), lpips=lpips)
    print(f"[unfit] {agg_unfit}")

    results = {"unfit": agg_unfit}
    if not args.skip_pose_opt:
        pose = optimize_test_poses(
            session, gts, rotations, translations, proj,
            num_iter_per_view=args.num_iter_per_view)
        agg_fit, _ = evaluate_session(
            session, pose, gts, proj,
            out_dir=os.path.join(args.model_path, "test", "fit"), lpips=lpips)
        print(f"[fit]   {agg_fit}")
        results["fit"] = agg_fit

    with open(os.path.join(args.model_path, "eval.txt"), "w") as f:
        for k, v in results.items():
            print(f"{k}: PSNR={v['PSNR']:.4f} SSIM={v['SSIM']:.4f} "
                  f"LPIPS={v['LPIPS']}", file=f)
    return results


if __name__ == "__main__":
    main()
