"""Model-layer tests: KNN, Gaussian model, Adam vs torch, schedules, losses,
motion module, densification state machine."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblurgs_tpu.core import lie
from deblurgs_tpu.models import densify as densify_lib
from deblurgs_tpu.models import gaussians as gm
from deblurgs_tpu.models import motion as motion_lib
from deblurgs_tpu.models import tonemap
from deblurgs_tpu.ops.knn import knn3_mean_sq_dist, _exact_knn3_mean_sq, _window_knn3_mean_sq
from deblurgs_tpu.train import losses, optim, schedules


class TestKNN:
    def test_exact_matches_numpy(self):
        pts = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (200, 3)))
        d = np.asarray(_exact_knn3_mean_sq(jnp.asarray(pts)))
        # numpy brute force
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        ref = np.sort(d2, axis=1)[:, :3].mean(1)
        np.testing.assert_allclose(d, ref, rtol=1e-5)

    def test_window_approximates_exact(self):
        pts = jax.random.normal(jax.random.PRNGKey(1), (3000, 3))
        exact = np.asarray(_exact_knn3_mean_sq(pts))
        approx = np.asarray(_window_knn3_mean_sq(pts, window=24))
        # the approximate fallback: exact for most points, never smaller
        rel = np.abs(approx - exact) / (exact + 1e-12)
        assert np.median(rel) < 1e-6
        assert np.mean(rel < 0.05) > 0.7
        assert (approx >= exact - 1e-6).all()


class TestGaussianModel:
    def make(self, n=50, capacity=64):
        key = jax.random.PRNGKey(0)
        pts = jax.random.normal(key, (n, 3))
        cols = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
        cfg = gm.GaussianConfig(sh_degree=2)
        params, aux = gm.create_from_pcd(pts, cols, cfg, capacity)
        return params, aux, cfg

    def test_create_shapes_and_active(self):
        params, aux, cfg = self.make()
        assert params.xyz.shape == (64, 3)
        assert params.f_rest.shape == (64, 8, 3)
        assert int(gm.num_active(aux)) == 50
        assert bool(aux.active[49]) and not bool(aux.active[50])

    def test_initial_opacity_and_scale(self):
        params, aux, cfg = self.make()
        opac = np.asarray(gm.get_opacity(params, cfg))[:50]
        np.testing.assert_allclose(opac, 0.1, atol=1e-6)
        scal = np.asarray(gm.get_scaling(params, cfg))[:50]
        assert (scal > 0).all()
        # isotropic: all three channels equal at init
        np.testing.assert_allclose(scal[:, 0], scal[:, 1])

    def test_reset_opacity_clamps_down(self):
        params, aux, cfg = self.make()
        params = params._replace(opacity=params.opacity + 0.7)
        params2 = gm.reset_opacity(params, cfg)
        opac = np.asarray(gm.get_opacity(params2, cfg))[:50]
        assert (opac <= 0.1 + 1e-6).all()


class TestAdamVsTorch:
    def test_matches_torch_adam(self):
        import torch

        np.random.seed(0)
        w0 = np.random.randn(7, 3).astype(np.float32)
        target = np.random.randn(7, 3).astype(np.float32)

        # torch
        wt = torch.tensor(w0, requires_grad=True)
        opt = torch.optim.Adam([wt], lr=3e-2, eps=1e-15)
        for _ in range(20):
            loss = ((wt - torch.tensor(target)) ** 2).sum()
            opt.zero_grad()
            loss.backward()
            opt.step()

        # ours
        params = {"w": jnp.asarray(w0)}
        state = optim.init(params)
        lr = {"w": jnp.float32(3e-2)}
        for _ in range(20):
            g = jax.grad(lambda p: jnp.sum((p["w"] - target) ** 2))(params)
            params, state = optim.update(params, g, state, lr)

        np.testing.assert_allclose(
            np.asarray(params["w"]), wt.detach().numpy(), atol=1e-5
        )

    def test_row_mask_freezes_rows(self):
        params = {"w": jnp.ones((4, 2))}
        state = optim.init(params)
        g = {"w": jnp.ones((4, 2))}
        mask = {"w": jnp.array([True, False, True, False])}
        p2, s2 = optim.update(params, g, state, {"w": jnp.float32(0.1)},
                              update_mask=mask)
        w = np.asarray(p2["w"])
        assert (w[0] != 1.0).all() and (w[2] != 1.0).all()
        assert (w[1] == 1.0).all() and (w[3] == 1.0).all()
        assert (np.asarray(s2.mu["w"])[1] == 0).all()

    def test_scalar_mask_freezes_leaf(self):
        params = {"w": jnp.ones(3)}
        state = optim.init(params)
        g = {"w": jnp.ones(3)}
        p2, s2 = optim.update(params, g, state, {"w": jnp.float32(0.1)},
                              update_mask={"w": jnp.asarray(False)})
        assert (np.asarray(p2["w"]) == 1.0).all()
        assert int(s2.step["w"]) == 0


class TestSchedules:
    def test_expon_lr_endpoints(self):
        f = lambda s: float(schedules.expon_lr(s, 1e-2, 1e-4, max_steps=1000))
        np.testing.assert_allclose(f(0), 1e-2, rtol=1e-5)
        np.testing.assert_allclose(f(1000), 1e-4, rtol=1e-5)
        np.testing.assert_allclose(f(500), math.sqrt(1e-2 * 1e-4), rtol=1e-4)
        np.testing.assert_allclose(f(2000), 1e-4, rtol=1e-5)

    def test_expon_lr_special_cases(self):
        assert float(schedules.expon_lr(10, 0.0, 1e-4)) == 0.0
        assert float(schedules.expon_lr(10, 1e-5, 1e-4)) == pytest.approx(1e-5)

    def test_curve_half_life(self):
        lr0 = float(schedules.curve_half_life_lr(1000, 1e-2, 1000, 500))
        lr1 = float(schedules.curve_half_life_lr(1500, 1e-2, 1000, 500))
        np.testing.assert_allclose(lr1 / lr0, 0.5, rtol=1e-5)

    def test_alignment_warmup(self):
        assert float(schedules.warmup_exp_decay(10, 3e-3, 1e-7, 100, 1000)) == 0.0
        assert float(schedules.warmup_exp_decay(101, 3e-3, 1e-7, 100, 1000)) > 0.0
        np.testing.assert_allclose(
            float(schedules.warmup_exp_decay(5000, 3e-3, 1e-7, 100, 1000)), 1e-7
        )


class TestLosses:
    def test_ssim_matches_torch_reference(self):
        import torch
        import torch.nn.functional as F

        img1 = np.random.RandomState(0).rand(3, 32, 40).astype(np.float32)
        img2 = np.random.RandomState(1).rand(3, 32, 40).astype(np.float32)

        # reference implementation (loss_utils.py:23-63)
        def gaussian(ws, sigma):
            g = torch.tensor([
                math.exp(-((x - ws // 2) ** 2) / (2 * sigma**2)) for x in range(ws)
            ])
            return g / g.sum()

        w1 = gaussian(11, 1.5).unsqueeze(1)
        win = w1.mm(w1.t()).float().unsqueeze(0).unsqueeze(0).expand(3, 1, 11, 11)
        t1, t2 = torch.tensor(img1)[None], torch.tensor(img2)[None]
        mu1 = F.conv2d(t1, win, padding=5, groups=3)
        mu2 = F.conv2d(t2, win, padding=5, groups=3)
        mu1s, mu2s, mu12 = mu1**2, mu2**2, mu1 * mu2
        s1 = F.conv2d(t1 * t1, win, padding=5, groups=3) - mu1s
        s2 = F.conv2d(t2 * t2, win, padding=5, groups=3) - mu2s
        s12 = F.conv2d(t1 * t2, win, padding=5, groups=3) - mu12
        C1, C2 = 0.01**2, 0.03**2
        ref = (((2 * mu12 + C1) * (2 * s12 + C2))
               / ((mu1s + mu2s + C1) * (s1 + s2 + C2))).mean().item()

        ours = float(losses.ssim(jnp.asarray(img1.transpose(1, 2, 0)),
                                 jnp.asarray(img2.transpose(1, 2, 0))))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_hinge(self):
        x = jnp.array([-0.5, 0.5, 1.5])
        np.testing.assert_allclose(
            float(losses.hinge_l2(x)), (0.25 + 0.0 + 0.25) / 3, rtol=1e-6
        )

    def test_smoothness_single_frame_zero(self):
        assert float(losses.batchwise_smoothness_loss(jnp.ones((1, 4, 4, 3)))) == 0.0

    def test_tonemap_roundtrip(self):
        x = jnp.linspace(0.01, 1.0, 50)
        y = tonemap.tone_map(tonemap.tone_map(x, "gamma"), "reverse_gamma")
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


class TestMotion:
    def make(self, n=4, noise=0.0):
        key = jax.random.PRNGKey(0)
        rotvec = jax.random.normal(key, (n, 3)) * 0.3
        rots = lie.so3_exp_map(rotvec)
        centers = jax.random.normal(jax.random.PRNGKey(1), (n, 3)) * 2.0
        cfg = motion_lib.MotionConfig(curve_order=5, n_subframes=7)
        params = motion_lib.init_motion(rots, centers, cfg, jax.random.PRNGKey(2),
                                        init_noise=noise)
        return params, cfg, rots, centers

    def test_init_reproduces_poses(self):
        params, cfg, rots, centers = self.make(noise=0.0)
        nu = jnp.array([0.0, 0.37, 1.0])
        for i in range(3):
            r, c = motion_lib.sample_c2w(params, i, nu, cfg)
            for f in range(3):
                np.testing.assert_allclose(np.asarray(r[f]), np.asarray(rots[i]),
                                           atol=1e-4)
                np.testing.assert_allclose(np.asarray(c[f]), np.asarray(centers[i]),
                                           atol=1e-4)

    def test_nu_sorted_with_endpoints(self):
        params, cfg, *_ = self.make(noise=0.001)
        nu = np.asarray(motion_lib.sample_nu(params, 1, cfg))
        assert nu[0] == 0.0 and nu[-1] == 1.0
        assert (np.diff(nu) >= 0).all()
        assert len(nu) == cfg.n_subframes

    def test_quat_cartesian_mode(self):
        key = jax.random.PRNGKey(3)
        rots = lie.so3_exp_map(jax.random.normal(key, (3, 3)) * 0.2)
        centers = jnp.zeros((3, 3))
        cfg = motion_lib.MotionConfig(curve_order=3, n_subframes=5,
                                      curve_type="quarternion_cartesian")
        params = motion_lib.init_motion(rots, centers, cfg, key, init_noise=0.0)
        r, c = motion_lib.sample_c2w(params, 0, jnp.array([0.5]), cfg)
        np.testing.assert_allclose(np.asarray(r[0]), np.asarray(rots[0]), atol=1e-4)

    def test_subframe_cameras_match_static_build(self):
        """Curve at a known pose must produce the same view matrix as the
        static camera constructors."""
        from deblurgs_tpu.core import camera as cam_lib

        params, cfg, rots, centers = self.make(noise=0.0)
        proj = cam_lib.get_projection_matrix(0.01, 100.0, 1.0, 0.8)
        cams = motion_lib.subframe_cameras(params, 2, jnp.array([0.5]), proj, cfg)
        view_direct = cam_lib.c2w_to_view(rots[2], centers[2])
        np.testing.assert_allclose(np.asarray(cams.view[0]),
                                   np.asarray(view_direct), atol=1e-4)


class TestDensify:
    def make(self):
        cfg = gm.GaussianConfig(sh_degree=1)
        pts = jnp.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]])
        cols = jnp.full((4, 3), 0.5)
        params, aux = gm.create_from_pcd(pts, cols, cfg, capacity=16)
        adam = optim.init(params)
        # make Gaussian 0 small, Gaussian 1 large
        scal = params.scaling
        scal = scal.at[0].set(gm.inverse_scaling(jnp.full(3, 1e-3), cfg))
        scal = scal.at[1].set(gm.inverse_scaling(jnp.full(3, 5.0), cfg))
        params = params._replace(scaling=scal)
        return params, aux, adam, cfg

    def test_clone_and_split(self):
        params, aux, adam, cfg = self.make()
        aux = aux._replace(
            xyz_grad_accum=jnp.array([1.0, 1.0, 0, 0] + [0] * 12),
            denom=jnp.array([1.0, 1, 1, 1] + [0] * 12),
        )
        adam = adam._replace(mu=jax.tree.map(lambda x: x + 1.0, adam.mu))
        p2, a2, ad2, rep = densify_lib.densify_and_prune(
            params, aux, adam, jax.random.PRNGKey(0), cfg=cfg,
            grad_threshold=0.5, scene_extent=10.0, percent_dense=0.01,
        )
        assert int(rep.n_cloned) == 1      # gaussian 0 (small)
        assert int(rep.n_split) == 1       # gaussian 1 (large)
        assert int(rep.n_dropped) == 0
        assert int(gm.num_active(a2)) == 6  # 4 + clone + split child2
        # clone landed at slot 4 (first free) with gaussian-0 params
        np.testing.assert_allclose(np.asarray(p2.xyz[4]), np.asarray(params.xyz[0]))
        # split: original slot 1 resampled, scaling shrunk by 1.6
        s_old = np.asarray(gm.get_scaling(params, cfg))[1]
        s_new = np.asarray(gm.get_scaling(p2, cfg))[1]
        np.testing.assert_allclose(s_new, s_old / 1.6, rtol=1e-4)
        # adam moments zeroed at touched slots
        assert (np.asarray(ad2.mu.xyz[4]) == 0).all()
        assert (np.asarray(ad2.mu.xyz[1]) == 0).all()
        assert (np.asarray(ad2.mu.xyz[2]) == 1).all()  # untouched survivor
        # stats reset
        assert (np.asarray(a2.xyz_grad_accum) == 0).all()

    def test_opacity_prune(self):
        params, aux, adam, cfg = self.make()
        params = params._replace(
            opacity=params.opacity.at[2, 0].set(0.0001)
        )
        p2, a2, ad2, rep = densify_lib.densify_and_prune(
            params, aux, adam, jax.random.PRNGKey(0), cfg=cfg,
            grad_threshold=0.5, scene_extent=10.0,
        )
        assert int(rep.n_pruned) == 1
        assert not bool(a2.active[2])

    def test_capacity_exhaustion_reported(self):
        cfg = gm.GaussianConfig(sh_degree=1)
        pts = jax.random.normal(jax.random.PRNGKey(0), (8, 3))
        params, aux = gm.create_from_pcd(pts, jnp.full((8, 3), 0.5), cfg, capacity=8)
        adam = optim.init(params)
        aux = aux._replace(
            xyz_grad_accum=jnp.ones(8), denom=jnp.ones(8)
        )
        p2, a2, ad2, rep = densify_lib.densify_and_prune(
            params, aux, adam, jax.random.PRNGKey(0), cfg=cfg,
            grad_threshold=0.5, scene_extent=10.0,
        )
        assert int(rep.n_dropped) == 8  # no free slots at all

    def test_split_children_near_parent(self):
        """Split samples must come from the parent's own ellipsoid
        (reference densify_and_split: N(0, scale) rotated by the parent)."""
        cfg = gm.GaussianConfig(sh_degree=1)
        pts = jnp.array([[0.0, 0.0, 0.0]])
        params, aux = gm.create_from_pcd(pts, jnp.full((1, 3), 0.5), cfg,
                                         capacity=8)
        # anisotropic parent: sigma = (1.0, 0.01, 0.01)
        params = params._replace(
            scaling=params.scaling.at[0].set(
                gm.inverse_scaling(jnp.array([1.0, 0.01, 0.01]), cfg)))
        aux = aux._replace(xyz_grad_accum=jnp.ones(8).at[1:].set(0),
                           denom=jnp.ones(8))
        adam = optim.init(params)
        child1s, child2s = [], []
        for seed in range(30):
            p2, a2, _, rep = densify_lib.densify_and_prune(
                params, aux, adam, jax.random.PRNGKey(seed), cfg=cfg,
                grad_threshold=0.5, scene_extent=1.0, percent_dense=0.01)
            assert int(rep.n_split) == 1
            child1s.append(np.asarray(p2.xyz[0]))
            child2s.append(np.asarray(p2.xyz[1]))
        c = np.concatenate([child1s, child2s])
        # children concentrate along the long axis (x), tight in y/z
        assert np.abs(c[:, 0]).std() > 0.5
        assert np.abs(c[:, 1]).max() < 0.06
        assert np.abs(c[:, 2]).max() < 0.06
        # shrunk scaling
        s_new = np.asarray(gm.get_scaling(p2, cfg))[0]
        np.testing.assert_allclose(s_new, np.array([1.0, 0.01, 0.01]) / 1.6,
                                   rtol=1e-4)

    def test_densify_render_stability(self):
        """A clone event must not catastrophically change the rendering
        (clones double-composite like the reference; bounded brightening)."""
        from deblurgs_tpu.ops.rasterize import RasterizeConfig, render
        from tests.scene_factory import make_camera

        cam, cs, _ = make_camera(width=32, height=32)
        cfg = gm.GaussianConfig(sh_degree=1)
        pts = jax.random.normal(jax.random.PRNGKey(0), (40, 3)) * 0.7
        params, aux = gm.create_from_pcd(pts, jnp.full((40, 3), 0.5), cfg,
                                         capacity=128)
        adam = optim.init(params)
        aux = aux._replace(
            xyz_grad_accum=jnp.where(jnp.arange(128) < 40, 1.0, 0.0),
            denom=jnp.ones(128))
        rcfg = RasterizeConfig(backend="xla", max_pairs=1 << 11, k_max=128)

        def img_of(p, a):
            rin = gm.render_inputs(p, cfg)
            return render(rin["means3d"], rin["scales"], rin["rotations"],
                          rin["opacities"], rin["shs"], cam, cs,
                          jnp.zeros(3), cfg=rcfg, sh_degree=1,
                          active=a.active).image

        before = np.asarray(img_of(params, aux))
        p2, a2, _, rep = densify_lib.densify_and_prune(
            params, aux, adam, jax.random.PRNGKey(1), cfg=cfg,
            grad_threshold=0.5, scene_extent=100.0, percent_dense=0.01)
        assert int(rep.n_cloned) + int(rep.n_split) == 40
        after = np.asarray(img_of(p2, a2))
        assert np.abs(after - before).mean() < 0.15, (
            np.abs(after - before).mean())


class TestSmallAPIs:
    def test_mark_visible(self):
        from deblurgs_tpu.ops.preprocess import mark_visible
        from tests.scene_factory import make_camera

        cam, cs, _ = make_camera()
        pts = jnp.array([[0.0, 0.0, 0.0],    # in front (cam at z=-4)
                         [0.0, 0.0, -4.1]])  # behind the camera
        vis = np.asarray(mark_visible(pts, cam))
        assert vis[0] and not vis[1]

    def test_decay_opacity(self):
        cfg = gm.GaussianConfig(sh_degree=1)
        pts = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
        params, aux = gm.create_from_pcd(pts, jnp.full((5, 3), 0.5), cfg, 8)
        p2 = gm.decay_opacity(params, cfg, 0.5)
        np.testing.assert_allclose(
            np.asarray(gm.get_opacity(p2, cfg))[:5],
            np.asarray(gm.get_opacity(params, cfg))[:5] * 0.5, atol=1e-6)

    def test_light_prune(self):
        cfg = gm.GaussianConfig(sh_degree=1)
        pts = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
        params, aux = gm.create_from_pcd(pts, jnp.full((5, 3), 0.5), cfg, 8)
        keep = jnp.arange(8) < 2
        a2 = gm.light_prune(aux, keep)
        assert int(gm.num_active(a2)) == 2

    def test_one_up_sh_degree(self):
        cfg = gm.GaussianConfig(sh_degree=2)
        assert gm.one_up_sh_degree(0, cfg) == 1
        assert gm.one_up_sh_degree(2, cfg) == 2
