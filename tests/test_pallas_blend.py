"""Pallas kernel parity vs the XLA backend (interpret mode on CPU).

The Pallas kernels use the prefix-product reformulation; these tests pin
that it reproduces the sequential-scan semantics (images and all gradients)
on scenes exercising early termination and multi-chunk tiles.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblurgs_tpu.ops.rasterize import RasterizeConfig, render
from tests.scene_factory import make_camera, make_gaussians

XLA_CFG = RasterizeConfig(backend="xla", max_pairs=1 << 14, k_max=512)
PL_CFG = RasterizeConfig(backend="pallas", max_pairs=1 << 14, interpret=True)


class TestPallasParity:
    PL_CFG = PL_CFG
    XLA_CFG = XLA_CFG
    def setup_method(self, method):
        self.cam, self.cs, _ = make_camera(width=48, height=32)
        (self.means, self.scales, self.rots,
         self.opac, self.shs) = make_gaussians(jax.random.PRNGKey(21), n=150,
                                               sh_deg=1, opacity_max=0.95)
        self.bg = jnp.array([0.2, 0.4, 0.6])

    def _render(self, cfg):
        return render(self.means, self.scales, self.rots, self.opac, self.shs,
                      self.cam, self.cs, self.bg, cfg=cfg, sh_degree=1)

    def test_forward_parity(self):
        a = self._render(self.PL_CFG)
        b = self._render(self.XLA_CFG)
        np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image),
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                                   atol=1e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(a.final_T),
                                   np.asarray(b.final_T), atol=2e-5)
        np.testing.assert_array_equal(np.asarray(a.n_contrib),
                                      np.asarray(b.n_contrib))

    def test_early_termination_scene(self):
        """Opaque wall of Gaussians → T crosses 1e-4, freeze semantics."""
        n = self.means.shape[0]
        means = jnp.stack(
            [
                0.2 * jax.random.normal(jax.random.PRNGKey(31), (n,)),
                0.2 * jax.random.normal(jax.random.PRNGKey(32), (n,)),
                jnp.linspace(-0.5, 0.5, n),
            ],
            axis=-1,
        )
        opac = jnp.full_like(self.opac, 0.98)
        a = render(means, self.scales, self.rots, opac, self.shs,
                   self.cam, self.cs, self.bg, cfg=self.PL_CFG, sh_degree=1)
        b = render(means, self.scales, self.rots, opac, self.shs,
                   self.cam, self.cs, self.bg, cfg=self.XLA_CFG, sh_degree=1)
        assert float(jnp.min(b.final_T)) < 1e-3  # termination actually hit
        np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image),
                                   atol=5e-5, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(a.final_T),
                                   np.asarray(b.final_T), atol=1e-6, rtol=1e-3)

    def test_gradient_parity(self):
        w_img = jax.random.normal(jax.random.PRNGKey(3), (32, 48, 3))
        w_depth = jax.random.normal(jax.random.PRNGKey(4), (32, 48)) * 0.01

        def loss(cfg, means, scales, rots, opac, shs, cam):
            out = render(means, scales, rots, opac, shs, cam, self.cs,
                         self.bg, cfg=cfg, sh_degree=1)
            return jnp.sum(out.image * w_img) + jnp.sum(out.depth * w_depth)

        args = (self.means, self.scales, self.rots, self.opac, self.shs, self.cam)
        g_pl = jax.grad(functools.partial(loss, self.PL_CFG),
                        argnums=(0, 1, 2, 3, 4, 5))(*args)
        g_xla = jax.grad(functools.partial(loss, self.XLA_CFG),
                         argnums=(0, 1, 2, 3, 4, 5))(*args)
        for name, a, b in zip(
            ["means", "scales", "rots", "opac", "shs", "cam"], g_pl, g_xla
        ):
            for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
                la, lb = np.asarray(la), np.asarray(lb)
                scale = np.abs(lb).max() + 1e-8
                # 1e-4 normalized: blend-level parity is ≤1e-5; the extra
                # slack absorbs f32 summation-order noise amplified through
                # the covariance/quaternion chain (pad layout affects the
                # segment-sum association order)
                np.testing.assert_allclose(la / scale, lb / scale, atol=1e-4,
                                           err_msg=f"grad mismatch: {name}")


class TestPallasParityWindowed(TestPallasParity):
    """window=4 grid (4 fine tiles per step): same semantics, ~half the
    pair-pixel volume at bench tile sizes. 8x8 tiles on a 48x32 image give
    6x4 = 24 tiles -> 6 windows, plus multi-chunk and straddle coverage.
    The XLA reference runs at the same tile size so binning layouts match
    exactly (equal-depth orderings included)."""

    PL_CFG = RasterizeConfig(backend="pallas", max_pairs=1 << 14,
                             interpret=True, window=4, tile_w=8, tile_h=8)
    XLA_CFG = RasterizeConfig(backend="xla", max_pairs=1 << 14, k_max=512,
                              tile_w=8, tile_h=8)


class TestPallasParityWindowPad(TestPallasParity):
    """window=4 with num_tiles not divisible by the window (3x2 16px tiles
    -> nt=6, padded to 8): exercises the padded-tile gates."""

    PL_CFG = RasterizeConfig(backend="pallas", max_pairs=1 << 14,
                             interpret=True, window=4)


class TestMixedLayout(TestPallasParity):
    """Single-pass mixed-tile chunk grid (layout="mixed"): each 128-pair
    chunk is visited once with segmented prefix products and one-hot output
    routing over W-tile blocks. 8x8 tiles on 48x32 -> 24 tiles, short
    per-tile lists -> chunks spanning many tiles (the hard case)."""

    PL_CFG = RasterizeConfig(backend="pallas", max_pairs=1 << 14,
                             interpret=True, layout="mixed", window=4,
                             tile_w=8, tile_h=8)
    XLA_CFG = RasterizeConfig(backend="xla", max_pairs=1 << 14, k_max=512,
                              tile_w=8, tile_h=8)


class TestMixedLayoutW1(TestPallasParity):
    """Mixed layout with 1-tile output blocks (window=1): every chunk span
    exercises the dual parity buffers and window-advance revisits."""

    PL_CFG = RasterizeConfig(backend="pallas", max_pairs=1 << 14,
                             interpret=True, layout="mixed", window=1)


class TestMixedLayoutBigTiles(TestPallasParity):
    """Mixed layout at 16x16 tiles (multi-chunk tiles: carry scratch across
    chunk boundaries within one tile)."""

    PL_CFG = RasterizeConfig(backend="pallas", max_pairs=1 << 14,
                             interpret=True, layout="mixed", window=2)


class TestMixedLayoutWideChunk(TestPallasParity):
    """Mixed layout with a 256-pair chunk override (cfg.chunk): the wide
    grid step halves step count (the kernel's fixed-overhead axis); a chunk
    spans more tiles, exercising multi-visit window advances."""

    PL_CFG = RasterizeConfig(backend="pallas", max_pairs=1 << 14,
                             interpret=True, layout="mixed", window=2,
                             chunk=256)


class TestMixedLayoutWideChunkFine(TestPallasParity):
    """512-pair chunks over 8x8 tiles: many short segments per chunk plus
    chunk-boundary carries (the hard wide-chunk case)."""

    PL_CFG = RasterizeConfig(backend="pallas", max_pairs=1 << 14,
                             interpret=True, layout="mixed", window=4,
                             tile_w=8, tile_h=8, chunk=512)
    XLA_CFG = RasterizeConfig(backend="xla", max_pairs=1 << 14, k_max=512,
                              tile_w=8, tile_h=8)


class TestTileCull:
    """Exact per-pair tile culling (pallas, need_n_contrib=False): images
    and gradients are unchanged — culled pairs could never pass the 1/255
    eligibility gate anywhere in their tile."""

    def setup_method(self, method):
        self.cam, self.cs, _ = make_camera(width=48, height=32)
        (self.means, self.scales, self.rots,
         self.opac, self.shs) = make_gaussians(jax.random.PRNGKey(77), n=150,
                                               sh_deg=1, opacity_max=0.95)
        self.bg = jnp.array([0.1, 0.2, 0.3])

    def _cfg(self, **kw):
        return RasterizeConfig(backend="pallas", max_pairs=1 << 14,
                               interpret=True, need_n_contrib=False,
                               tile_w=8, tile_h=8, **kw)

    def test_cull_image_and_grad_parity(self):
        w_img = jax.random.normal(jax.random.PRNGKey(5), (32, 48, 3))

        def loss(cfg, means, opac):
            out = render(means, self.scales, self.rots, opac, self.shs,
                         self.cam, self.cs, self.bg, cfg=cfg, sh_degree=1)
            return jnp.sum(out.image * w_img), out.image

        for layout in ("lockstep", "mixed"):
            (l_on, img_on), g_on = jax.value_and_grad(
                functools.partial(loss, self._cfg(tile_cull=True,
                                                  layout=layout, window=2)),
                argnums=(0, 1), has_aux=True)(self.means, self.opac)
            (l_off, img_off), g_off = jax.value_and_grad(
                functools.partial(loss, self._cfg(tile_cull=False,
                                                  layout=layout, window=2)),
                argnums=(0, 1), has_aux=True)(self.means, self.opac)
            np.testing.assert_allclose(np.asarray(img_on),
                                       np.asarray(img_off),
                                       atol=2e-6, err_msg=layout)
            # removing culled slots reorders the segment sums — grads agree
            # up to f32 accumulation order
            for a, b in zip(g_on, g_off):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=3e-5, rtol=1e-5,
                                           err_msg=layout)

    def test_tile_visible_is_conservative_and_tight(self):
        """_tile_visible must never cull a pair that some pixel composites,
        and must match the continuous-box max exactly on a dense probe."""
        from deblurgs_tpu.ops import pallas_blend as pb

        class _Cfg:
            tile_w = 8
            tile_h = 8

        key = jax.random.PRNGKey(9)
        n = 512
        ks = jax.random.split(key, 6)
        mx = jax.random.uniform(ks[0], (n,), minval=-12.0, maxval=20.0)
        my = jax.random.uniform(ks[1], (n,), minval=-12.0, maxval=20.0)
        # random PSD conics: a,c > 0, b^2 < ac
        a = jax.random.uniform(ks[2], (n,), minval=0.02, maxval=2.0)
        c = jax.random.uniform(ks[3], (n,), minval=0.02, maxval=2.0)
        b = (jax.random.uniform(ks[4], (n,), minval=-0.95, maxval=0.95)
             * jnp.sqrt(a * c))
        opac = jax.random.uniform(ks[5], (n,), minval=0.005, maxval=1.0)
        fslot = jnp.stack([mx, my, a, b, c, opac])
        vis = pb._tile_visible(_Cfg, fslot, jnp.zeros(n), jnp.zeros(n))

        px, py = jnp.meshgrid(jnp.arange(8.0), jnp.arange(8.0))
        dx = mx[:, None] - px.ravel()[None, :]
        dy = my[:, None] - py.ravel()[None, :]
        power = (-0.5 * (a[:, None] * dx * dx + c[:, None] * dy * dy)
                 - b[:, None] * dx * dy)
        alpha = opac[:, None] * jnp.exp(jnp.minimum(power, 0.0))
        brute_visible = jnp.any(alpha >= 1.0 / 255.0, axis=1)
        # conservative: everything brute-visible must be kept
        assert not bool(jnp.any(brute_visible & ~vis))
        # tight enough to be useful: culls a majority of far-away pairs
        far = (mx < -8) | (mx > 16) | (my < -8) | (my > 16)
        assert float(jnp.mean(vis[far].astype(jnp.float32))) < 0.5


class TestTightRect:
    """Per-axis 1/255-ellipse AABB emission rects: pair count shrinks,
    images/gradients unchanged (vs the reference 3σ square rect)."""

    def setup_method(self, method):
        self.cam, self.cs, _ = make_camera(width=48, height=32)
        (self.means, self.scales, self.rots,
         self.opac, self.shs) = make_gaussians(jax.random.PRNGKey(11), n=150,
                                               sh_deg=1, opacity_max=0.6)
        self.bg = jnp.array([0.3, 0.1, 0.5])

    def test_parity_and_reduction(self):
        w_img = jax.random.normal(jax.random.PRNGKey(6), (32, 48, 3))

        def run(tight, backend="pallas"):
            cfg = RasterizeConfig(backend=backend, max_pairs=1 << 14,
                                  interpret=True, need_n_contrib=False,
                                  tile_w=8, tile_h=8, tight_rect=tight,
                                  k_max=512)

            def loss(means, opac):
                out = render(means, self.scales, self.rots, opac, self.shs,
                             self.cam, self.cs, self.bg, cfg=cfg,
                             sh_degree=1)
                return jnp.sum(out.image * w_img), (out.image, out.num_pairs)

            (l, (img, npair)), g = jax.value_and_grad(
                loss, argnums=(0, 1), has_aux=True)(self.means, self.opac)
            return img, npair, g

        img_t, np_t, g_t = run(True)
        img_r, np_r, g_r = run(False)
        assert int(np_t) < int(np_r)   # actually shrinks the emission
        np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_r),
                                   atol=2e-6)
        for a, b in zip(g_t, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-5, rtol=1e-5)
        # xla backend agrees too (shared preprocess)
        img_x, _, _ = run(True, backend="xla")
        np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_x),
                                   atol=1e-4)


def test_windowed_grad_reduce_matches_segment_sum():
    """DEBLURGS_REDUCE=window path: sort-by-rank + one-hot matmul reduction
    equals segment_sum (compact ranks are consecutive, so chunks span ≤128
    consecutive ranks); NaN garbage in sentinel slots must not leak."""
    from deblurgs_tpu.ops import pallas_blend as pb

    for seed, n_emit, P, mp in [(0, 37, 300, 1024), (3, 555, 4000, 4096)]:
        key = jax.random.PRNGKey(seed)
        counts = jax.random.randint(key, (n_emit,), 1, 40)
        total = min(int(counts.sum()), mp)
        ranks = jnp.repeat(jnp.arange(n_emit), counts,
                           total_repeat_length=mp)
        pg = jnp.where(jnp.arange(mp) < total, ranks, P).astype(jnp.int32)
        grads = jax.random.normal(jax.random.PRNGKey(1), (16, mp))
        grads = grads.at[10:].set(0.0)  # rows 10-15 structurally zero
        grads = jnp.where((jnp.arange(mp) < total)[None, :], grads, jnp.nan)
        ref = jax.ops.segment_sum(
            jnp.where((pg < P)[:, None], grads.T, 0.0),
            jnp.minimum(pg, P), num_segments=P + 1)[:P]
        got = pb._reduce_sorted(pg, grads, P, interpret=True)
        np.testing.assert_allclose(np.asarray(got)[:n_emit, :10],
                                   np.asarray(ref)[:n_emit, :10],
                                   atol=2e-5, rtol=1e-5)
        assert not np.isnan(np.asarray(got)[:n_emit]).any()


class TestIndefiniteConicGrads:
    """Regression: the round-3 meso-joint curve NaN (it≈6800).

    The MXU bilinear power form's f32 cancellation error scales with its
    term magnitudes, so a degenerate / hyper-anisotropic splat can yield a
    computed power of +hundreds on pixels where the true power is ≤ 0 — or
    a numerically negative det can make the conic genuinely indefinite.
    Pre-fix, exp(power) overflowed to inf and the backward's G·dL_dalpha
    (dL_dalpha masked to 0 on ineligible lanes) produced inf·0 = NaN,
    poisoning the pair's mean2d/conic/opacity gradients (but NOT its color
    grads — no G factor — exactly the field pattern of the poisoned
    runs/r3_meso_state.npz). These tests feed an indefinite conic whose
    power exceeds the f32 exp overflow threshold through blend_fused (the
    shipping pallas path) and require finite grads matching the (gated)
    XLA backend.
    """

    def _scene(self):
        # one 16x16 tile, 3 splats in depth order: [normal, HOSTILE, normal].
        # All means sit OFF the pixel grid: a mean exactly on a pixel puts
        # that pixel on the power<=0 eligibility boundary, where the MXU
        # bilinear form and the direct form can legitimately gate
        # differently in f32. The hostile's (indefinite) power is then
        # strictly positive at every pixel — ineligible everywhere, with
        # far-field power > +800 (inf exp pre-fix)
        means2d = jnp.array([[8.3, 8.2], [4.5, 12.5], [10.4, 6.3]])
        conic = jnp.array([
            [0.08, 0.01, 0.06],     # healthy PSD
            [-5.0, -0.1, -5.0],     # indefinite: power = +2.5(dx²+dy²)+...
            [0.05, 0.0, 0.05],
        ])
        opacity = jnp.array([0.8, 0.9, 0.7])
        color = jnp.array([[0.9, 0.2, 0.1], [0.2, 0.9, 0.3], [0.1, 0.3, 0.8]])
        depth = jnp.array([2.0, 3.0, 4.0])
        bg = jnp.array([0.25, 0.5, 0.75])
        rect = jnp.broadcast_to(jnp.array([0, 0, 1, 1], jnp.int32), (3, 4))
        area = jnp.ones((3,), jnp.int32)
        return (means2d, conic, opacity, color, depth), rect, area, bg

    def _xla_reference_grads(self, loss_w):
        """XLA blend with the equivalent manual pair list (direct power
        computation — no bilinear factorization, gated exp)."""
        from deblurgs_tpu.ops.tile_blend import BlendConfig, blend

        fields, _, _, bg = self._scene()
        mp = 128
        pair_gauss = jnp.full(mp, 3, jnp.int32).at[:3].set(
            jnp.array([0, 1, 2], jnp.int32))
        pair_tile = jnp.full(mp, 1, jnp.int32).at[:3].set(0)
        tile_start = jnp.zeros(1, jnp.int32)
        tile_stop = jnp.full(1, 3, jnp.int32)
        cfg = BlendConfig(width=16, height=16, tile_w=16, tile_h=16,
                          k_max=8, backend="xla")
        w_img, w_dep = loss_w

        def loss(*f):
            img, dep, _, _ = blend(cfg, pair_gauss, pair_tile, tile_start,
                                   tile_stop, *f, bg)
            return jnp.sum(img * w_img) + w_dep * jnp.sum(dep)

        val = loss(*fields)
        g = jax.grad(loss, argnums=tuple(range(5)))(*fields)
        return val, g

    @pytest.mark.parametrize("layout,window", [("lockstep", 1), ("mixed", 1),
                                               ("mixed", 2)])
    def test_finite_grads_match_xla(self, layout, window):
        from deblurgs_tpu.ops.tile_blend import BlendConfig, blend_fused

        fields, rect, area, bg = self._scene()
        cfg = BlendConfig(width=16, height=16, tile_w=16, tile_h=16,
                          k_max=8, max_pairs=128, backend="pallas",
                          interpret=True, layout=layout, window=window,
                          need_n_contrib=False, tile_cull=False)
        w_img = jax.random.normal(jax.random.PRNGKey(7), (16, 16, 3))

        def loss(*f):
            img, dep, *_ = blend_fused(cfg, *f, rect, area, bg)
            return jnp.sum(img * w_img) + 0.1 * jnp.sum(dep)

        val_pl = loss(*fields)
        g_pl = jax.grad(loss, argnums=tuple(range(5)))(*fields)
        val_x, g_xla = self._xla_reference_grads((w_img, 0.1))
        assert np.isfinite(float(val_pl))
        np.testing.assert_allclose(float(val_pl), float(val_x), rtol=1e-5)
        names = ["means2d", "conic", "opacity", "color", "depth"]
        for name, a, b in zip(names, g_pl, g_xla):
            a, b = np.asarray(a), np.asarray(b)
            assert np.isfinite(a).all(), f"non-finite pallas grad: {name}\n{a}"
            assert np.isfinite(b).all(), f"non-finite xla grad: {name}\n{b}"
            np.testing.assert_allclose(a, b, atol=3e-5, rtol=5e-4,
                                       err_msg=f"grad mismatch: {name}")
        # the hostile pair is ineligible at every pixel: its own field
        # grads must be exactly zero (pre-fix they were NaN)
        assert np.all(np.asarray(g_pl[1])[1] == 0.0), np.asarray(g_pl[1])[1]
        assert np.all(np.asarray(g_pl[2])[1] == 0.0), np.asarray(g_pl[2])[1]

    @pytest.mark.parametrize("layout", ["lockstep", "mixed"])
    def test_forward_parity_with_hostile_pair(self, layout):
        from deblurgs_tpu.ops.tile_blend import BlendConfig, blend_fused

        fields, rect, area, bg = self._scene()
        cfg = BlendConfig(width=16, height=16, tile_w=16, tile_h=16,
                          k_max=8, max_pairs=128, backend="pallas",
                          interpret=True, layout=layout,
                          need_n_contrib=False, tile_cull=False)
        out = blend_fused(cfg, *fields, rect, area, bg)
        val_x, _ = self._xla_reference_grads(
            (jnp.ones((16, 16, 3)), 0.0))
        img = np.asarray(out[0])
        assert np.isfinite(img).all()
        np.testing.assert_allclose(img.sum(), float(val_x), rtol=1e-5)


class TestMixedChunkSkip:
    """Chunk-level early exit (the CUDA T<1e-4 termination analog): a
    saturated single-segment-continuation chunk is skipped entirely. The
    skip must (a) actually ENGAGE on a saturating scene — asserted via the
    SS bits of the recorded step map plus everywhere-frozen final_T — and
    (b) be EXACT: image, depth, final_T and every gradient match the XLA
    sequential reference bit-for-bit-close."""

    def _scene(self):
        # 700 copies of one fat opaque splat covering the whole frame:
        # every tile owns ~5-6 chunks of pairs and every pixel's T crosses
        # 1e-4 within the first chunk, so chunks 2+ of each tile are
        # single-segment continuations with a dead carry -> skipped.
        cam, cs, _ = make_camera(width=64, height=32)
        n = 700
        key = jax.random.PRNGKey(9)
        means = 0.05 * jax.random.normal(key, (n, 3))
        scales = jnp.full((n, 3), 2.5)
        rots = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
        opac = jnp.full((n,), 0.9)
        shs = jax.random.normal(jax.random.PRNGKey(10), (n, 4, 3)) * 0.3
        bg = jnp.array([0.3, 0.1, 0.5])
        return cam, cs, means, scales, rots, opac, shs, bg

    def test_skip_engages_and_is_exact(self, monkeypatch):
        from deblurgs_tpu.ops import pallas_blend_mixed as mixed

        cam, cs, means, scales, rots, opac, shs, bg = self._scene()
        pl_cfg = RasterizeConfig(backend="pallas", max_pairs=1 << 13,
                                 interpret=True, layout="mixed", window=2)
        xla_cfg = RasterizeConfig(backend="xla", max_pairs=1 << 13,
                                  k_max=1024)

        recorded = {}
        orig = mixed.prepare_mixed

        def spy(*args, **kwargs):
            prep = orig(*args, **kwargs)
            recorded["smap"] = np.asarray(prep.smap)
            return prep

        monkeypatch.setattr(mixed, "prepare_mixed", spy)

        w_img = jax.random.normal(jax.random.PRNGKey(3), (32, 64, 3))

        def loss(cfg, means, scales, rots, opac, shs, cam):
            out = render(means, scales, rots, opac, shs, cam, cs, bg,
                         cfg=cfg, sh_degree=1)
            return (jnp.sum(out.image * w_img) + 0.01 * jnp.sum(out.depth),
                    out)

        (val_pl, out_pl), g_pl = jax.value_and_grad(
            functools.partial(loss, pl_cfg), argnums=(0, 1, 2, 3, 4, 5),
            has_aux=True)(means, scales, rots, opac, shs, cam)
        (val_x, out_x), g_x = jax.value_and_grad(
            functools.partial(loss, xla_cfg), argnums=(0, 1, 2, 3, 4, 5),
            has_aux=True)(means, scales, rots, opac, shs, cam)

        # (a) skip preconditions hold: SS steps exist, and every pixel
        # froze early (final_T is the LAST LIVE product, so it sits just
        # above/around eps; the carry itself keeps multiplying by
        # (1-alpha)≈0.1 per pair and is ≲ 0.1^128 ≈ 0 by each tile's
        # second chunk — the skip therefore engages on every SS step)
        smap = recorded["smap"]
        flags = smap[4]
        alive = (flags // 8) % 2 == 1
        ss = ((flags // 16) % 2 == 1) & alive
        assert ss.sum() >= 10, f"SS steps: {ss.sum()} of {alive.sum()} alive"
        assert float(jnp.max(out_x.final_T)) < 1e-2
        assert int(out_x.max_per_tile) > 2 * 128  # tiles span 3+ chunks

        # (b) exactness
        np.testing.assert_allclose(np.asarray(out_pl.image),
                                   np.asarray(out_x.image),
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out_pl.final_T),
                                   np.asarray(out_x.final_T),
                                   atol=1e-7, rtol=1e-3)
        np.testing.assert_allclose(float(val_pl), float(val_x), rtol=1e-4)
        for name, a, b in zip(
            ["means", "scales", "rots", "opac", "shs", "cam"], g_pl, g_x
        ):
            for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
                la, lb = np.asarray(la), np.asarray(lb)
                scale = np.abs(lb).max() + 1e-8
                np.testing.assert_allclose(la / scale, lb / scale,
                                           atol=1e-4,
                                           err_msg=f"grad mismatch: {name}")


class TestMixedLayoutRectTiles(TestPallasParity):
    """Rectangular 16x8 tiles (tile_w != tile_h): half the pixel volume per
    chunk at a modest pair-count increase — a perf operating point the
    bench A/B sweeps. Parity vs the XLA backend at the SAME tile shape
    (rect emission follows the reference's int-ceil tile-rect semantics,
    which an oracle without rects legitimately differs from at sub-pixel
    boundary reach)."""

    PL_CFG = RasterizeConfig(backend="pallas", max_pairs=1 << 14,
                             interpret=True, layout="mixed", window=2,
                             tile_w=16, tile_h=8)
    XLA_CFG = RasterizeConfig(backend="xla", max_pairs=1 << 14, k_max=512,
                              tile_w=16, tile_h=8)


class TestMixedLayoutRectTilesTall(TestPallasParity):
    """8x16 (tall) tiles: the transposed rect case."""

    PL_CFG = RasterizeConfig(backend="pallas", max_pairs=1 << 14,
                             interpret=True, layout="mixed", window=1,
                             tile_w=8, tile_h=16)
    XLA_CFG = RasterizeConfig(backend="xla", max_pairs=1 << 14, k_max=512,
                              tile_w=8, tile_h=16)


class TestFastBlend:
    """``fast=True`` (mixed layout): drops the per-lane T<1e-4 freeze gates.
    Bounded-error contract: outputs within _T_EPS/(1-alpha)-order of the
    exact path (the frozen T sits up to that much above the continued
    product, since the CUDA freeze rejects the crossing update) — image
    ~1e-3-order worst case, grads ~1e-3 normalized."""

    FAST_CFG = RasterizeConfig(backend="pallas", max_pairs=1 << 14,
                               interpret=True, layout="mixed", window=2,
                               need_n_contrib=False, fast=True)
    EXACT_CFG = RasterizeConfig(backend="pallas", max_pairs=1 << 14,
                                interpret=True, layout="mixed", window=2,
                                need_n_contrib=False)

    def setup_method(self, method):
        self.cam, self.cs, _ = make_camera(width=48, height=32)
        (self.means, self.scales, self.rots,
         self.opac, self.shs) = make_gaussians(jax.random.PRNGKey(21), n=150,
                                               sh_deg=1, opacity_max=0.95)
        self.bg = jnp.array([0.2, 0.4, 0.6])

    def _render(self, cfg, means=None, opac=None):
        return render(means if means is not None else self.means,
                      self.scales, self.rots,
                      opac if opac is not None else self.opac, self.shs,
                      self.cam, self.cs, self.bg, cfg=cfg, sh_degree=1)

    def test_config_validation(self):
        import pytest

        with pytest.raises(ValueError, match="fast"):
            self._render(RasterizeConfig(backend="pallas", interpret=True,
                                         layout="mixed", fast=True))
        with pytest.raises(ValueError, match="fast"):
            self._render(RasterizeConfig(backend="xla", fast=True,
                                         need_n_contrib=False))

    def test_forward_within_eps_bound(self):
        a = self._render(self.FAST_CFG)
        b = self._render(self.EXACT_CFG)
        np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                                   atol=2e-2)
        np.testing.assert_allclose(np.asarray(a.final_T),
                                   np.asarray(b.final_T), atol=2e-4)

    def test_saturating_scene_within_eps_bound(self):
        """The hard case: T actually crosses 1e-4, so the freeze gates the
        fast path drops are live in the exact path."""
        n = self.means.shape[0]
        means = jnp.stack(
            [0.2 * jax.random.normal(jax.random.PRNGKey(31), (n,)),
             0.2 * jax.random.normal(jax.random.PRNGKey(32), (n,)),
             jnp.linspace(-0.5, 0.5, n)], axis=-1)
        opac = jnp.full_like(self.opac, 0.98)
        a = self._render(self.FAST_CFG, means=means, opac=opac)
        b = self._render(self.EXACT_CFG, means=means, opac=opac)
        assert float(jnp.min(b.final_T)) < 1e-3
        # the frozen T can sit up to _T_EPS/(1-alpha) above the continued
        # product (the CUDA freeze REJECTS the crossing update,
        # forward.cu:339-341), so the bound is 1e-3-order here
        np.testing.assert_allclose(np.asarray(a.image), np.asarray(b.image),
                                   atol=1e-3)
        # alpha reaches 0.98 in this scene -> bound _T_EPS/(1-0.98) = 5e-3
        np.testing.assert_allclose(np.asarray(a.final_T),
                                   np.asarray(b.final_T), atol=5e-3)

    def test_gradient_parity(self):
        w_img = jax.random.normal(jax.random.PRNGKey(3), (32, 48, 3))
        w_depth = jax.random.normal(jax.random.PRNGKey(4), (32, 48)) * 0.01

        def loss(cfg, means, scales, rots, opac, shs, cam):
            out = render(means, scales, rots, opac, shs, cam, self.cs,
                         self.bg, cfg=cfg, sh_degree=1)
            return jnp.sum(out.image * w_img) + jnp.sum(out.depth * w_depth)

        args = (self.means, self.scales, self.rots, self.opac, self.shs,
                self.cam)
        g_f = jax.grad(functools.partial(loss, self.FAST_CFG),
                       argnums=(0, 1, 2, 3, 4, 5))(*args)
        g_e = jax.grad(functools.partial(loss, self.EXACT_CFG),
                       argnums=(0, 1, 2, 3, 4, 5))(*args)
        for name, a, b in zip(
            ["means", "scales", "rots", "opac", "shs", "cam"], g_f, g_e
        ):
            for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
                la, lb = np.asarray(la), np.asarray(lb)
                scale = np.abs(lb).max() + 1e-8
                np.testing.assert_allclose(la / scale, lb / scale, atol=1e-3,
                                           err_msg=f"grad mismatch: {name}")
