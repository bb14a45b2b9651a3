"""Directory-based metrics CLI — reference ``metrics.py``: PSNR/SSIM/LPIPS
over ``<model>/test/<method>/{renders,gt}``, writing results.json +
per_view.json."""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

import numpy as np


def read_images_dir(path):
    from PIL import Image

    names = sorted(os.listdir(path))
    imgs = [np.asarray(Image.open(os.path.join(path, n)),
                       dtype=np.float32)[..., :3] / 255.0 for n in names]
    return imgs, names


def evaluate_model_dir(model_path: str, lpips_weights: str | None = None):
    from deblurgs_tpu.eval import metrics as m

    lpips = m.LPIPS.from_file(lpips_weights)
    if lpips is None:
        print("[metrics] no LPIPS weights available — reporting PSNR/SSIM only")
    test_dir = os.path.join(model_path, "test")
    full = {}
    for method in sorted(os.listdir(test_dir)):
        mdir = os.path.join(test_dir, method)
        renders, names = read_images_dir(os.path.join(mdir, "renders"))
        gts, _ = read_images_dir(os.path.join(mdir, "gt"))
        agg, per_view = m.evaluate_pairs(renders, gts, lpips)
        m.write_results(model_path, method, agg, per_view, names)
        print(f"{method}: PSNR={agg['PSNR']:.4f} SSIM={agg['SSIM']:.4f} "
              f"LPIPS={agg['LPIPS']}")
        full[method] = agg
    return full


def main(argv=None):
    from deblurgs_tpu.cli.args import apply_platform_env
    apply_platform_env()
    parser = ArgumentParser()
    parser.add_argument("--model_paths", "-m", nargs="+", required=True)
    parser.add_argument("--lpips_weights", type=str, default=None)
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    out = {}
    for path in args.model_paths:
        out[path] = evaluate_model_dir(path, args.lpips_weights)
    return out


if __name__ == "__main__":
    main()
