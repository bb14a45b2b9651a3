"""Image-quality metrics: PSNR / SSIM / LPIPS (reference ``metrics.py``,
``utils/image_utils.py``, ``lpipsPyTorch/``).

LPIPS: the reference downloads pretrained AlexNet/VGG weights from github at
runtime (``lpipsPyTorch/modules/utils.py``) — impossible in an offline
deployment. Here LPIPS is a pure-JAX VGG16 feature distance whose weights
load from a local ``.npz`` (``LPIPS_WEIGHTS`` env var or explicit path);
when no weights are available it reports ``None`` and the aggregate tools
skip it, rather than failing the evaluation.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from deblurgs_tpu.train.losses import psnr as _psnr
from deblurgs_tpu.train.losses import ssim as _ssim


def psnr(img: jax.Array, gt: jax.Array) -> float:
    return float(_psnr(img, gt))


def ssim(img: jax.Array, gt: jax.Array) -> float:
    return float(_ssim(img, gt))


# ---------------------------------------------------------------------------
# LPIPS (VGG16 feature distance, offline weights)
# ---------------------------------------------------------------------------

_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
_FEATURE_TAPS = (1, 3, 6, 9, 12)  # conv indices after which features are read
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    """VGG16-backbone LPIPS. ``weights``: dict with conv kernels
    ``conv{i}/w`` [kh,kw,cin,cout], ``conv{i}/b``, and linear heads
    ``lin{j}/w`` [1,1,c,1]."""

    def __init__(self, weights: dict):
        self.weights = {k: jnp.asarray(v) for k, v in weights.items()}

    @classmethod
    def from_file(cls, path: str | None = None):
        path = path or os.environ.get("LPIPS_WEIGHTS", "")
        if not path or not os.path.exists(path):
            return None
        with np.load(path) as d:
            return cls(dict(d))

    def __call__(self, img: jax.Array, gt: jax.Array) -> jax.Array:
        """img, gt: [H, W, 3] in [0, 1]."""

        def feats(x):
            x = (2.0 * x - 1.0 - _SHIFT) / _SCALE
            x = x[None]
            outs = []
            conv_i = 0
            for spec in _VGG_CFG:
                if spec == "M":
                    x = jax.lax.reduce_window(
                        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                        "VALID")
                    continue
                w = self.weights[f"conv{conv_i}/w"]
                b = self.weights[f"conv{conv_i}/b"]
                x = jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                x = jax.nn.relu(x + b)
                if conv_i in _FEATURE_TAPS:
                    outs.append(x)
                conv_i += 1
            return outs

        f1, f2 = feats(img), feats(gt)
        total = 0.0
        for j, (a, b) in enumerate(zip(f1, f2)):
            a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
            b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
            d = (a - b) ** 2
            w = self.weights[f"lin{j}/w"]
            d = jax.lax.conv_general_dilated(
                d, w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            total = total + jnp.mean(d, axis=(1, 2))
        return total[0, 0]


def evaluate_pairs(renders: list, gts: list, lpips: LPIPS | None = None):
    """Aggregate metrics over (render, gt) image pairs → dict + per-view."""
    per_view = {"psnr": [], "ssim": [], "lpips": []}
    for img, gt in zip(renders, gts):
        img, gt = jnp.asarray(img), jnp.asarray(gt)
        per_view["psnr"].append(psnr(img, gt))
        per_view["ssim"].append(ssim(img, gt))
        per_view["lpips"].append(float(lpips(img, gt)) if lpips else None)
    agg = {
        "PSNR": float(np.mean(per_view["psnr"])),
        "SSIM": float(np.mean(per_view["ssim"])),
        "LPIPS": (float(np.mean(per_view["lpips"]))
                  if lpips else None),
    }
    return agg, per_view


def write_results(out_dir: str, method: str, agg: dict, per_view: dict,
                  image_names: list):
    """``results.json`` / ``per_view.json`` (reference ``metrics.py:88-91``)."""
    results_path = os.path.join(out_dir, "results.json")
    pv_path = os.path.join(out_dir, "per_view.json")
    results = json.load(open(results_path)) if os.path.exists(results_path) else {}
    results[method] = agg
    json.dump(results, open(results_path, "w"), indent=2)
    pv = json.load(open(pv_path)) if os.path.exists(pv_path) else {}
    pv[method] = {
        metric: dict(zip(image_names, vals))
        for metric, vals in per_view.items()
    }
    json.dump(pv, open(pv_path, "w"), indent=2)
