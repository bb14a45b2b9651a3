"""Rasterizer correctness: tile-binned path vs the dense oracle (SURVEY §4.1).

The oracle is plain autodiff-able JAX implementing the CUDA blend semantics
literally; the tile path must match it in both the image and every gradient.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblurgs_tpu.core import transforms
from deblurgs_tpu.ops import binning as binning_lib
from deblurgs_tpu.ops import preprocess as pre_lib
from deblurgs_tpu.ops.rasterize import RasterizeConfig, render
from tests.scene_factory import make_camera, make_gaussians

XLA_CFG = RasterizeConfig(backend="xla", max_pairs=1 << 14, k_max=512)
ORACLE_CFG = RasterizeConfig(backend="oracle")


def _render_scalar_loss(cfg, weights, *params):
    """Weighted sums of image+depth → scalar; for gradient comparison."""
    means, scales, rots, opac, shs, cam = params
    cs = _render_scalar_loss.cs
    out = render(means, scales, rots, opac, shs, cam, cs,
                 _render_scalar_loss.bg, cfg=cfg, sh_degree=1)
    w_img, w_depth = weights
    return jnp.sum(out.image * w_img) + jnp.sum(out.depth * w_depth)


class TestForwardParity:
    def setup_method(self, method):
        self.cam, self.cs, _ = make_camera(width=64, height=48)
        (self.means, self.scales, self.rots,
         self.opac, self.shs) = make_gaussians(jax.random.PRNGKey(0), n=300, sh_deg=1)
        self.bg = jnp.array([0.1, 0.2, 0.3])

    def _render(self, cfg):
        return render(self.means, self.scales, self.rots, self.opac, self.shs,
                      self.cam, self.cs, self.bg, cfg=cfg, sh_degree=1)

    def test_tile_matches_oracle_image(self):
        a = self._render(XLA_CFG)
        b = self._render(ORACLE_CFG)
        np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(a.final_T), np.asarray(b.final_T),
                                   atol=1e-5)

    def test_not_trivially_empty(self):
        a = self._render(XLA_CFG)
        # scene actually covers pixels and has opacity accumulation
        assert float(jnp.mean(a.final_T)) < 0.9
        assert int(jnp.sum(a.visible)) > 50
        assert int(a.num_pairs) > 100

    def test_background_fills_empty_pixels(self):
        out = self._render(XLA_CFG)
        empty = np.asarray(out.final_T) > 0.999
        if empty.any():
            img = np.asarray(out.image)[empty]
            np.testing.assert_allclose(
                img, np.broadcast_to(np.asarray(self.bg), img.shape), atol=1e-4
            )
        # depth background: D + T*z_far
        np.testing.assert_allclose(
            np.asarray(out.depth)[empty],
            100.0 * np.asarray(out.final_T)[empty], atol=1e-2,
        )


class TestGradientParity:
    """Hand-written tile VJP vs oracle autodiff, end-to-end through render()."""

    def setup_method(self, method):
        self.cam, self.cs, _ = make_camera(width=48, height=32)
        (self.means, self.scales, self.rots,
         self.opac, self.shs) = make_gaussians(jax.random.PRNGKey(3), n=120, sh_deg=1)
        self.bg = jnp.array([0.25, 0.5, 0.75])
        key = jax.random.PRNGKey(7)
        self.w_img = jax.random.normal(key, (32, 48, 3))
        self.w_depth = jax.random.normal(jax.random.PRNGKey(8), (32, 48)) * 0.01

    def _loss(self, cfg, means, scales, rots, opac, shs, cam):
        out = render(means, scales, rots, opac, shs, cam, self.cs, self.bg,
                     cfg=cfg, sh_degree=1)
        return jnp.sum(out.image * self.w_img) + jnp.sum(out.depth * self.w_depth)

    def test_grads_match_oracle(self):
        args = (self.means, self.scales, self.rots, self.opac, self.shs, self.cam)
        g_tile = jax.grad(functools.partial(self._loss, XLA_CFG),
                          argnums=(0, 1, 2, 3, 4, 5))(*args)
        g_orac = jax.grad(functools.partial(self._loss, ORACLE_CFG),
                          argnums=(0, 1, 2, 3, 4, 5))(*args)
        names = ["means", "scales", "rots", "opacity", "shs", "camera"]
        for name, gt, go in zip(names, g_tile, g_orac):
            gt_l = jax.tree_util.tree_leaves(gt)
            go_l = jax.tree_util.tree_leaves(go)
            for a, b in zip(gt_l, go_l):
                a, b = np.asarray(a), np.asarray(b)
                scale = np.abs(b).max() + 1e-8
                np.testing.assert_allclose(
                    a / scale, b / scale, atol=2e-5,
                    err_msg=f"gradient mismatch for {name}",
                )
                assert np.abs(b).max() > 0, f"oracle grad for {name} is all-zero"

    def test_camera_grads_nonzero(self):
        """Pose gradients (the fork's dL_dview/dL_dproj) must flow."""
        g = jax.grad(
            lambda cam: self._loss(XLA_CFG, self.means, self.scales,
                                   self.rots, self.opac, self.shs, cam)
        )(self.cam)
        assert np.abs(np.asarray(g.view)).max() > 0
        assert np.abs(np.asarray(g.full_proj)).max() > 0

    def test_vsp_gradient_matches_ndc_chain(self):
        """d loss/d vsp must equal the NDC-space viewspace grad."""
        vsp = jnp.zeros((self.means.shape[0], 2))

        def loss_vsp(cfg, vsp):
            out = render(self.means, self.scales, self.rots, self.opac,
                         self.shs, self.cam, self.cs, self.bg,
                         cfg=cfg, sh_degree=1, vsp=vsp)
            return jnp.sum(out.image * self.w_img)

        g_tile = np.asarray(jax.grad(functools.partial(loss_vsp, XLA_CFG))(vsp))
        g_orac = np.asarray(jax.grad(functools.partial(loss_vsp, ORACLE_CFG))(vsp))
        scale = np.abs(g_orac).max() + 1e-8
        np.testing.assert_allclose(g_tile / scale, g_orac / scale, atol=2e-5)
        assert np.abs(g_orac).max() > 0


class TestNumericalGradient:
    """check_grads-style finite differences on a micro scene."""

    def test_fd_means(self):
        cam, cs, _ = make_camera(width=16, height=16)
        means, scales, rots, opac, shs = make_gaussians(
            jax.random.PRNGKey(11), n=6, spread=0.6, opacity_max=0.7
        )
        bg = jnp.array([0.3, 0.3, 0.3])
        w = jax.random.normal(jax.random.PRNGKey(12), (16, 16, 3))
        cfg = RasterizeConfig(backend="xla", max_pairs=1 << 10, k_max=32)

        def loss(m):
            out = render(m, scales, rots, opac, shs, cam, cs, bg,
                         cfg=cfg, sh_degree=1)
            return jnp.sum(out.image * w)

        g = np.asarray(jax.grad(loss)(means))
        # Central differences on sampled coordinates. The implemented function
        # is intentionally non-smooth at rect/alpha gate boundaries (same as
        # the CUDA kernels), so only assert where two eps scales agree —
        # i.e. where FD actually estimates a derivative.
        rng = np.random.RandomState(0)
        f = jax.jit(loss)
        checked = 0
        for _ in range(12):
            i, j = rng.randint(0, 6), rng.randint(0, 3)

            def fd(eps):
                return (float(f(means.at[i, j].add(eps)))
                        - float(f(means.at[i, j].add(-eps)))) / (2 * eps)

            f1, f2 = fd(3e-3), fd(1e-3)
            if abs(f1 - f2) > 0.05 * max(1.0, abs(f1)):
                continue  # boundary-dominated coordinate
            checked += 1
            assert abs(f1 - g[i, j]) < 5e-2 * max(1.0, abs(f1)), (i, j, f1, g[i, j])
        assert checked >= 4


class TestBinning:
    def test_ranges_partition_pairs(self):
        cam, cs, _ = make_camera(width=64, height=48)
        means, scales, rots, opac, shs = make_gaussians(jax.random.PRNGKey(5), n=100)
        cov6 = transforms.build_covariance(scales, rots)
        pre = pre_lib.preprocess(means, cov6, shs, None, opac, cam, cs, sh_degree=0)
        bins = binning_lib.bin_gaussians(pre, tiles_x=4, tiles_y=3, max_pairs=1 << 13)
        start, stop = np.asarray(bins.tile_start), np.asarray(bins.tile_stop)
        tile = np.asarray(bins.pair_tile)
        total = int(bins.num_pairs)
        assert total == int(np.asarray(pre.tiles_touched).sum())
        # ranges tile the valid prefix exactly
        assert (stop >= start).all()
        assert int((stop - start).sum()) == total
        for t in [0, 5, 11]:
            seg = tile[start[t]:stop[t]]
            assert (seg == t).all()
        # depth sorted within a tile
        depth = np.asarray(pre.depth)
        gauss = np.asarray(bins.pair_gauss)
        for t in range(12):
            d = depth[gauss[start[t]:stop[t]]]
            assert (np.diff(d) >= 0).all()

    def test_overflow_reported(self):
        cam, cs, _ = make_camera(width=64, height=48)
        means, scales, rots, opac, shs = make_gaussians(jax.random.PRNGKey(6), n=100)
        cov6 = transforms.build_covariance(scales, rots)
        pre = pre_lib.preprocess(means, cov6, shs, None, opac, cam, cs, sh_degree=0)
        bins = binning_lib.bin_gaussians(pre, tiles_x=4, tiles_y=3, max_pairs=16)
        assert int(bins.num_pairs) > 16  # emitted count is still reported
        assert np.asarray(bins.pair_tile).shape == (16,)
