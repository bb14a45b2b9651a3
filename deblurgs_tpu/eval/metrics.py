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
# LPIPS (VGG16 / AlexNet feature distance, offline weights)
# ---------------------------------------------------------------------------
#
# Semantics pinned to the reference's vendored ``lpipsPyTorch``:
# - input images stay in [0, 1] and are normalized as ``(x − shift) / scale``
#   (``modules/networks.py:50-51`` — the vendored fork does NOT rescale to
#   [−1, 1] first, unlike upstream richzhang LPIPS);
# - activations unit-normalized as ``x / (‖x‖₂ + 1e-10)``
#   (``modules/utils.py:6-8`` — norm PLUS eps, not max(norm, eps));
# - per-tap squared diff → 1×1 non-negative linear head → spatial mean →
#   sum over taps (``modules/lpips.py:30-37``).
# ``metrics.py:74`` uses the vgg backbone; ``test.py:120`` uses alex — both
# architectures are supported. Weights arrive as a local ``.npz`` built by
# ``scripts/convert_lpips_weights.py`` (the reference downloads them at
# runtime, ``modules/utils.py:11-21`` — impossible offline). When no weights
# are available LPIPS reports ``None`` instead of failing the evaluation.

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# layer specs: ("conv", k, stride, pad, c_out) | ("max", k, stride);
# taps = conv indices (0-based) whose post-relu activation feeds a lin head
LPIPS_ARCHS = {
    "vgg": dict(
        layers=(
            [("conv", 3, 1, 1, 64), ("conv", 3, 1, 1, 64), ("max", 2, 2),
             ("conv", 3, 1, 1, 128), ("conv", 3, 1, 1, 128), ("max", 2, 2),
             ("conv", 3, 1, 1, 256), ("conv", 3, 1, 1, 256),
             ("conv", 3, 1, 1, 256), ("max", 2, 2),
             ("conv", 3, 1, 1, 512), ("conv", 3, 1, 1, 512),
             ("conv", 3, 1, 1, 512), ("max", 2, 2),
             ("conv", 3, 1, 1, 512), ("conv", 3, 1, 1, 512),
             ("conv", 3, 1, 1, 512)]
        ),
        taps=(1, 3, 6, 9, 12),
        channels=(64, 128, 256, 512, 512),
    ),
    "alex": dict(
        layers=(
            [("conv", 11, 4, 2, 64), ("max", 3, 2),
             ("conv", 5, 1, 2, 192), ("max", 3, 2),
             ("conv", 3, 1, 1, 384), ("conv", 3, 1, 1, 256),
             ("conv", 3, 1, 1, 256)]
        ),
        taps=(0, 1, 2, 3, 4),
        channels=(64, 192, 384, 256, 256),
    ),
}


class LPIPS:
    """LPIPS distance. ``weights``: dict with conv kernels ``conv{i}/w``
    [kh,kw,cin,cout] (HWIO), biases ``conv{i}/b`` [cout], and linear heads
    ``lin{j}/w`` [1,1,c,1]; ``net_type``: 'vgg' | 'alex'."""

    def __init__(self, weights: dict, net_type: str = "vgg"):
        self.weights = {k: jnp.asarray(v) for k, v in weights.items()
                        if not k.startswith("meta")}
        self.arch = LPIPS_ARCHS[net_type]
        self.net_type = net_type

    #: packaged default — drop the output of
    #: ``scripts/convert_lpips_weights.py`` here and eval picks it up with
    #: no flag or env var (this build environment has no network egress,
    #: so the converted file cannot ship pre-baked; see README)
    DEFAULT_WEIGHTS = os.path.join(os.path.dirname(__file__),
                                   "lpips_weights.npz")

    @classmethod
    def from_file(cls, path: str | None = None, net_type: str | None = None):
        path = (path or os.environ.get("LPIPS_WEIGHTS", "")
                or (cls.DEFAULT_WEIGHTS
                    if os.path.exists(cls.DEFAULT_WEIGHTS) else ""))
        if not path or not os.path.exists(path):
            return None
        with np.load(path) as d:
            weights = dict(d)
        if net_type is None:
            net_type = (str(weights["meta_arch"]) if "meta_arch" in weights
                        else "vgg")
        return cls(weights, net_type=net_type)

    def __call__(self, img: jax.Array, gt: jax.Array) -> jax.Array:
        """img, gt: [H, W, 3] in [0, 1]."""

        def feats(x):
            x = (x - _SHIFT) / _SCALE      # z_score on [0,1] input (quirk)
            x = x[None]
            outs = []
            conv_i = 0
            for spec in self.arch["layers"]:
                if spec[0] == "max":
                    _, k, s = spec
                    x = jax.lax.reduce_window(
                        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
                        "VALID")
                    continue
                _, k, s, p, _c = spec
                w = self.weights[f"conv{conv_i}/w"]
                b = self.weights[f"conv{conv_i}/b"]
                x = jax.lax.conv_general_dilated(
                    x, w, (s, s), [(p, p), (p, p)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                x = jax.nn.relu(x + b)
                if conv_i in self.arch["taps"]:
                    outs.append(x)
                conv_i += 1
            return outs

        f1, f2 = feats(img), feats(gt)
        total = 0.0
        for j, (a, b) in enumerate(zip(f1, f2)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
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
