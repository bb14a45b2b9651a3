"""Batched multi-view rendering (one launch for F views, stacked tile axis)
vs per-view render calls: images, gradients (shared scene params, per-view
cameras), and the per-view viewspace densification channel must match.
"""

import jax
import jax.numpy as jnp
import numpy as np

from deblurgs_tpu.core import camera as cam_lib
from deblurgs_tpu.core import lie
from deblurgs_tpu.ops.rasterize import RasterizeConfig, render, render_batch
from tests.scene_factory import make_camera, make_gaussians

F = 3


def _setup():
    cam0, cs, proj = make_camera(width=48, height=32)
    gauss = make_gaussians(jax.random.PRNGKey(13), n=120, sh_deg=1,
                           opacity_max=0.9)
    # F distinct cameras: small pose offsets around the base view
    rots = lie.so3_exp_map(0.05 * jax.random.normal(
        jax.random.PRNGKey(14), (F, 3)))
    centers = (jnp.array([0.0, 0.0, -4.0])[None, :]
               + 0.1 * jax.random.normal(jax.random.PRNGKey(15), (F, 3)))
    views = jax.vmap(cam_lib.c2w_to_view)(rots, centers)
    cams = jax.vmap(lambda v: cam_lib.make_camera_arrays(v, proj))(views)
    return gauss, cams, cs


def test_batch_matches_loop():
    (means, scales, rots, opac, shs), cams, cs = _setup()
    bg = jnp.array([0.15, 0.25, 0.35])
    cfg = RasterizeConfig(backend="pallas", max_pairs=1 << 15,
                          interpret=True, layout="mixed", window=4,
                          tile_w=8, tile_h=8, need_n_contrib=False)
    w_img = jax.random.normal(jax.random.PRNGKey(7), (F, 32, 48, 3))

    def loss_batch(means, opac, cams, vsp):
        out = render_batch(means, scales, rots, opac, shs, cams, cs, bg,
                           cfg=cfg, sh_degree=1, vsp=vsp)
        return jnp.sum(out.image * w_img), out

    def loss_loop(means, opac, cams, vsp):
        imgs, radii = [], []
        for s in range(F):
            cam = jax.tree.map(lambda l: l[s], cams)
            o = render(means, scales, rots, opac, shs, cam, cs, bg,
                       cfg=cfg, sh_degree=1, vsp=vsp[s])
            imgs.append(o.image)
            radii.append(o.radii)
        return (jnp.sum(jnp.stack(imgs) * w_img),
                (jnp.stack(imgs), jnp.stack(radii)))

    vsp = jnp.zeros((F, means.shape[0], 2))
    (lb, ob), gb = jax.value_and_grad(
        loss_batch, argnums=(0, 1, 2, 3), has_aux=True)(
        means, opac, cams, vsp)
    (ll, (img_l, radii_l)), gl = jax.value_and_grad(
        loss_loop, argnums=(0, 1, 2, 3), has_aux=True)(
        means, opac, cams, vsp)

    np.testing.assert_allclose(np.asarray(ob.image), np.asarray(img_l),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(ob.radii), np.asarray(radii_l))
    names = ["means", "opac", "cams", "vsp"]
    for name, a, b in zip(names, gb, gl):
        for la, lb_ in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            la, lb_ = np.asarray(la), np.asarray(lb_)
            scale = np.abs(lb_).max() + 1e-8
            np.testing.assert_allclose(la / scale, lb_ / scale, atol=1e-4,
                                       err_msg=f"grad mismatch: {name}")


def test_batch_requires_mixed():
    (means, scales, rots, opac, shs), cams, cs = _setup()
    cfg = RasterizeConfig(backend="pallas", max_pairs=1 << 14,
                          interpret=True)
    try:
        render_batch(means, scales, rots, opac, shs, cams, cs,
                     jnp.zeros(3), cfg=cfg, sh_degree=1)
    except NotImplementedError:
        return
    raise AssertionError("expected NotImplementedError")


def test_single_view_keeps_batch_axis():
    """F=1 must return [1, H, W, 3] like any other F (blend's single-image
    convention must not leak through — the n_sub=1 warm-up phase of a
    batched-render training step consumes the view axis)."""
    gauss, cams, cs = _setup()
    cams1 = jax.tree.map(lambda x: x[:1], cams)
    cfg = RasterizeConfig(backend="pallas", layout="mixed", interpret=True,
                          max_pairs=1 << 13, tile_w=16, tile_h=16,
                          need_n_contrib=False)
    out = render_batch(*gauss, cams1, cs, jnp.zeros(3), cfg=cfg, sh_degree=1)
    assert out.image.shape == (1, 32, 48, 3)
    assert out.depth.shape == (1, 32, 48)
    ref = render(*gauss, jax.tree.map(lambda x: x[0], cams1), cs,
                 jnp.zeros(3), cfg=cfg, sh_degree=1)
    np.testing.assert_allclose(np.asarray(out.image[0]),
                               np.asarray(ref.image), atol=2e-5)
