"""Preprocess semantics vs an independent float64 NumPy transliteration of
the CUDA math (forward.cu:85-268): projection with the +1e-7 w guard, EWA
cov2D with the 1.3·tanfov clamp and +0.3 dilation, conic/radius/rect, and
the near-cull. This pins the formulas themselves, independent of JAX."""

import numpy as np
import jax
import jax.numpy as jnp

from deblurgs_tpu.core.transforms import build_covariance
from deblurgs_tpu.ops import preprocess as pre_lib
from tests.scene_factory import make_camera, make_gaussians


def numpy_preprocess(means, cov6, view, full_proj, cs, tile=16):
    """Direct f64 port of preprocessCUDA/computeCov2D."""
    n = means.shape[0]
    out = {
        "px": np.zeros(n), "py": np.zeros(n),
        "conic": np.zeros((n, 3)), "depth": np.zeros(n),
        "radius": np.zeros(n, np.int32), "visible": np.zeros(n, bool),
        "rect": np.zeros((n, 4), np.int32),
    }
    tiles_x = -(-cs.width // tile)
    tiles_y = -(-cs.height // tile)
    fx, fy = cs.focal_x, cs.focal_y
    W2V = view.T  # column convention W2V
    for i in range(n):
        p = means[i]
        p_view = W2V[:3, :3] @ p + W2V[:3, 3]
        out["depth"][i] = p_view[2]
        if p_view[2] <= 0.2:
            continue
        hom = np.append(p, 1.0) @ full_proj
        w = 1.0 / (hom[3] + 1e-7)
        ndc = hom[:3] * w

        # computeCov2D
        t = p_view.copy()
        limx, limy = 1.3 * cs.tanfovx, 1.3 * cs.tanfovy
        t[0] = min(limx, max(-limx, t[0] / t[2])) * t[2]
        t[1] = min(limy, max(-limy, t[1] / t[2])) * t[2]
        J = np.array([
            [fx / t[2], 0, -fx * t[0] / t[2] ** 2],
            [0, fy / t[2], -fy * t[1] / t[2] ** 2],
        ])
        R = W2V[:3, :3]
        xx, xy, xz, yy, yz, zz = cov6[i]
        S = np.array([[xx, xy, xz], [xy, yy, yz], [xz, yz, zz]])
        cov = J @ R @ S @ R.T @ J.T
        a, b, c = cov[0, 0] + 0.3, cov[0, 1], cov[1, 1] + 0.3
        det = a * c - b * b
        if det == 0:
            continue
        conic = np.array([c, -b, a]) / det
        mid = 0.5 * (a + c)
        lam = mid + np.sqrt(max(0.1, mid * mid - det))
        radius = int(np.ceil(3.0 * np.sqrt(lam)))
        px = ((ndc[0] + 1) * cs.width - 1) * 0.5
        py = ((ndc[1] + 1) * cs.height - 1) * 0.5
        x0 = int(np.clip(np.floor((px - radius) / tile), 0, tiles_x))
        y0 = int(np.clip(np.floor((py - radius) / tile), 0, tiles_y))
        x1 = int(np.clip(np.floor((px + radius + tile - 1) / tile), 0, tiles_x))
        y1 = int(np.clip(np.floor((py + radius + tile - 1) / tile), 0, tiles_y))
        if (x1 - x0) * (y1 - y0) == 0:
            continue
        out["px"][i], out["py"][i] = px, py
        out["conic"][i] = conic
        out["radius"][i] = radius
        out["rect"][i] = (x0, y0, x1, y1)
        out["visible"][i] = True
    return out


def test_preprocess_matches_numpy_port():
    cam, cs, _ = make_camera(width=64, height=48)
    means, scales, rots, opac, shs = make_gaussians(jax.random.PRNGKey(9), n=200)
    cov6 = build_covariance(scales, rots)
    pre = pre_lib.preprocess(means, cov6, shs, None, opac, cam, cs, sh_degree=0)

    ref = numpy_preprocess(
        np.asarray(means, np.float64), np.asarray(cov6, np.float64),
        np.asarray(cam.view, np.float64), np.asarray(cam.full_proj, np.float64),
        cs,
    )
    vis = np.asarray(pre.visible)
    np.testing.assert_array_equal(vis, ref["visible"])
    assert vis.sum() > 50
    m2d = np.asarray(pre.means2d)
    np.testing.assert_allclose(m2d[vis, 0], ref["px"][vis], atol=2e-2)
    np.testing.assert_allclose(m2d[vis, 1], ref["py"][vis], atol=2e-2)
    np.testing.assert_allclose(np.asarray(pre.conic)[vis], ref["conic"][vis],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pre.depth)[vis], ref["depth"][vis],
                               rtol=1e-5)
    # radius: integer ceil can flip by 1 at f32/f64 boundaries
    assert (np.abs(np.asarray(pre.radius)[vis] - ref["radius"][vis]) <= 1).all()
    agree = (np.asarray(pre.rect)[vis] == ref["rect"][vis]).all(axis=-1)
    assert agree.mean() > 0.95
