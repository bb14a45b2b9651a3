"""Pixel/tile-axis (row-slab) sharded rendering vs the single-device render.

The crop-camera construction (parallel/tile_shard.py) must reproduce the
full-frame render exactly: same EWA covariances (full-camera clamp limits),
same emission sets (z-only culling + zero-area off-slab rects), slabs
re-assembled by out_specs. Gradients of replicated scene inputs are psum'd
over slabs by shard_map's transpose — checked against single-device grads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblurgs_tpu.core import camera as cam_lib
from deblurgs_tpu.ops.rasterize import RasterizeConfig, render
from deblurgs_tpu.parallel import tile_shard
from tests.scene_factory import make_camera, make_gaussians

CFG = RasterizeConfig(backend="xla", max_pairs=1 << 14, k_max=512)


@pytest.fixture(scope="module")
def scene():
    cam, cs, proj = make_camera(width=64, height=48)
    gauss = make_gaussians(jax.random.PRNGKey(7), n=180, sh_deg=1,
                           opacity_max=0.95)
    bg = jnp.array([0.3, 0.1, 0.5])
    return cam, cs, proj, gauss, bg


@pytest.mark.parametrize("n_dev", [2, 8])
def test_row_sharded_forward_parity(scene, n_dev):
    cam, cs, proj, gauss, bg = scene
    mesh = tile_shard.make_pixel_mesh(n_dev)
    fn = tile_shard.row_sharded_render(mesh, cs, proj, CFG, sh_degree=1)
    a = fn(*gauss, cam.view, bg)
    b = render(*gauss, cam, cs, bg, cfg=CFG, sh_degree=1)
    np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(a.final_T),
                               np.asarray(b.final_T), atol=2e-4)
    # slab-union diagnostics reproduce the full-frame ones
    np.testing.assert_array_equal(np.asarray(a.visible),
                                  np.asarray(b.visible))
    np.testing.assert_array_equal(np.asarray(a.radii), np.asarray(b.radii))


def test_crop_camera_math(scene):
    """The crop projection maps full-image pixel rows to slab-local rows."""
    cam, cs, proj, gauss, bg = scene
    from deblurgs_tpu.ops.preprocess import ndc2pix, project_points

    n, tile_h = 4, 16
    cs_slab, projs = tile_shard.crop_cameras(cs, proj, n, tile_h)
    assert cs_slab.focal_y == pytest.approx(cs.focal_y, rel=1e-6)
    pts = gauss[0][:50]
    _, ndc_full = project_points(pts, cam)
    py_full = ndc2pix(ndc_full[:, 1], cs.height)
    for d in range(n):
        cam_d = cam_lib.make_camera_arrays(cam.view, projs[d])
        _, ndc_d = project_points(pts, cam_d)
        py_d = ndc2pix(ndc_d[:, 1], cs_slab.height)
        np.testing.assert_allclose(np.asarray(py_d),
                                   np.asarray(py_full - d * cs_slab.height),
                                   atol=1e-3)


def test_row_sharded_gradient_parity(scene):
    cam, cs, proj, gauss, bg = scene
    mesh = tile_shard.make_pixel_mesh(4)
    fn = tile_shard.row_sharded_render(mesh, cs, proj, CFG, sh_degree=1)
    w = jax.random.normal(jax.random.PRNGKey(5), (48, 64, 3))

    def loss_sharded(means, opac):
        out = fn(means, gauss[1], gauss[2], opac, gauss[4], cam.view, bg)
        return jnp.sum(out.image * w)

    def loss_single(means, opac):
        out = render(means, gauss[1], gauss[2], opac, gauss[4], cam, cs, bg,
                     cfg=CFG, sh_degree=1)
        return jnp.sum(out.image * w)

    ga = jax.grad(loss_sharded, argnums=(0, 1))(gauss[0], gauss[3])
    gb = jax.grad(loss_single, argnums=(0, 1))(gauss[0], gauss[3])
    for name, la, lb in zip(["means", "opac"], ga, gb):
        la, lb = np.asarray(la), np.asarray(lb)
        scale = np.abs(lb).max() + 1e-8
        np.testing.assert_allclose(la / scale, lb / scale, atol=2e-4,
                                   err_msg=f"grad mismatch: {name}")


def test_height_not_divisible(scene):
    """H=48 over 5 slabs (tile-aligned slab_h pads past H): crop is exact."""
    cam, cs, proj, gauss, bg = scene
    mesh = tile_shard.make_pixel_mesh(5)
    fn = tile_shard.row_sharded_render(mesh, cs, proj, CFG, sh_degree=1)
    a = fn(*gauss, cam.view, bg)
    b = render(*gauss, cam, cs, bg, cfg=CFG, sh_degree=1)
    assert a.image.shape == b.image.shape
    np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image),
                               atol=2e-4, rtol=1e-3)
