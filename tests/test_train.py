"""End-to-end train step integration tests (SURVEY.md §4.4): tiny synthetic
scene, loss must decrease; the blur phase must move curve parameters."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from deblurgs_tpu.core import camera as cam_lib
from deblurgs_tpu.core import lie
from deblurgs_tpu.models import gaussians as gm
from deblurgs_tpu.models import motion as motion_lib
from deblurgs_tpu.ops.rasterize import RasterizeConfig, render
from deblurgs_tpu.train import step as step_lib
from deblurgs_tpu.train.config import OptimizationConfig


def build_synthetic(key, n_cams=4, n_pts=48, width=32, height=32):
    """A 'true' Gaussian scene rendered from a camera ring = training data."""
    fovx = 1.1
    fovy = 2 * math.atan(math.tan(fovx / 2) * height / width)
    cs = cam_lib.CameraStatic(width=width, height=height,
                              tanfovx=math.tan(fovx / 2),
                              tanfovy=math.tan(fovy / 2))
    proj = cam_lib.get_projection_matrix(0.01, 100.0, fovx, fovy)

    ks = jax.random.split(key, 6)
    pts = jax.random.normal(ks[0], (n_pts, 3)) * 0.8
    cols = jax.random.uniform(ks[1], (n_pts, 3), minval=0.1, maxval=0.9)

    gcfg = gm.GaussianConfig(sh_degree=1)
    true_params, true_aux = gm.create_from_pcd(pts, cols, gcfg, capacity=n_pts)
    # make the true scene chunky & opaque so images carry signal
    true_params = true_params._replace(
        opacity=jnp.full_like(true_params.opacity, 0.8),
    )

    rots, centers, views = [], [], []
    for i in range(n_cams):
        ang = 2 * math.pi * i / max(n_cams, 1) * 0.15
        rot = lie.so3_exp_map(jnp.array([[0.0, ang, 0.0]]))[0]
        center = rot @ jnp.array([0.0, 0.0, -4.0])
        rots.append(rot)
        centers.append(center)
        views.append(cam_lib.c2w_to_view(rot, center))
    rots = jnp.stack(rots)
    centers = jnp.stack(centers)

    rcfg = RasterizeConfig(backend="xla", max_pairs=1 << 12, k_max=256)
    rin = gm.render_inputs(true_params, gcfg)
    gts = []
    bg = jnp.zeros(3)
    for v in views:
        cam = cam_lib.make_camera_arrays(v, proj)
        out = render(rin["means3d"], rin["scales"], rin["rotations"],
                     rin["opacities"], rin["shs"], cam, cs, bg,
                     cfg=rcfg, sh_degree=1, active=true_aux.active)
        gts.append(out.image)
    gts = jnp.stack(gts)
    return dict(cs=cs, proj=proj, gts=gts, rots=rots, centers=centers,
                pts=pts, cols=cols, gcfg=gcfg, rcfg=rcfg)


class TestTrainStep:
    def test_sharp_phase_loss_decreases(self):
        data = build_synthetic(jax.random.PRNGKey(0))
        gcfg, rcfg = data["gcfg"], data["rcfg"]
        # init from noisy points
        noisy = data["pts"] + 0.05 * jax.random.normal(jax.random.PRNGKey(1),
                                                       data["pts"].shape)
        params, aux = gm.create_from_pcd(noisy, data["cols"], gcfg, capacity=96)
        mcfg = motion_lib.MotionConfig(curve_order=3, n_subframes=5)
        motion_params = motion_lib.init_motion(data["rots"], data["centers"],
                                               mcfg, jax.random.PRNGKey(2),
                                               init_noise=0.0)
        ocfg = OptimizationConfig(
            iterations=400, curve_start_iter=10_000,  # stay in sharp phase
            densify_from_iter=50, densification_interval=100,
            densify_until_iter=300, opacity_reset_interval=10_000,
            position_lr_init=0.004, position_lr_final=0.0004,
            lambda_hinge=0.1,
        )
        st = step_lib.TrainStatics(
            gcfg=gcfg, mcfg=mcfg, ocfg=ocfg, rcfg=rcfg, cs=data["cs"],
            sh_degree=1, n_sub=1, tone_mapping="identity",
            spatial_lr_scale=2.0,
        )
        state = step_lib.init_state(params, motion_params, aux,
                                    jax.random.PRNGKey(3))
        fn = step_lib.make_train_step(st)

        first_losses, last_losses = [], []
        n_cams = data["gts"].shape[0]
        for it in range(120):
            idx = it % n_cams
            state, metrics = fn(state, data["gts"][idx], jnp.int32(idx),
                                data["proj"])
            if it < 12:
                first_losses.append(float(metrics.l1))
            if it >= 108:
                last_losses.append(float(metrics.l1))
        assert np.mean(last_losses) < 0.55 * np.mean(first_losses), (
            np.mean(first_losses), np.mean(last_losses))
        assert int(metrics.num_active) >= 48  # densify may add, never nuke

    def test_blur_phase_updates_curves(self):
        data = build_synthetic(jax.random.PRNGKey(5), n_cams=2)
        gcfg, rcfg = data["gcfg"], data["rcfg"]
        params, aux = gm.create_from_pcd(data["pts"], data["cols"], gcfg,
                                         capacity=64)
        mcfg = motion_lib.MotionConfig(curve_order=3, n_subframes=5)
        motion_params = motion_lib.init_motion(data["rots"], data["centers"],
                                               mcfg, jax.random.PRNGKey(6),
                                               init_noise=0.01)
        ocfg = OptimizationConfig(
            iterations=1000, curve_start_iter=1, curve_end_iter=1000,
            densify_from_iter=10_000, opacity_reset_interval=10_000,
        )
        st = step_lib.TrainStatics(
            gcfg=gcfg, mcfg=mcfg, ocfg=ocfg, rcfg=rcfg, cs=data["cs"],
            sh_degree=1, n_sub=5, tone_mapping="identity",
            spatial_lr_scale=2.0,
        )
        state = step_lib.init_state(params, motion_params, aux,
                                    jax.random.PRNGKey(7))
        fn = step_lib.make_train_step(st)
        m0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.motion)
        for it in range(4):
            state, metrics = fn(state, data["gts"][it % 2],
                                jnp.int32(it % 2), data["proj"])
        assert np.isfinite(float(metrics.loss))
        # curve control points moved (grads flowed through SE(3) exp + render)
        d_rot = np.abs(np.asarray(state.motion.rot_ctrl) - m0.rot_ctrl).max()
        d_trans = np.abs(np.asarray(state.motion.trans_ctrl) - m0.trans_ctrl).max()
        assert d_rot > 0 and d_trans > 0

    def test_alignment_nu_receives_gradients(self):
        """The alignment logits must sit INSIDE the differentiated forward
        (reference motion.py:127 samples `_nu` under autograd in the same
        Adam group). Round 3 sampled nu from `state.motion` outside
        value_and_grad, silently disconnecting it — caught by an
        all-zero-moments audit of runs/r3_meso_state.npz."""
        data = build_synthetic(jax.random.PRNGKey(5), n_cams=2)
        gcfg, rcfg = data["gcfg"], data["rcfg"]
        params, aux = gm.create_from_pcd(data["pts"], data["cols"], gcfg,
                                         capacity=64)
        mcfg = motion_lib.MotionConfig(curve_order=3, n_subframes=5)
        motion_params = motion_lib.init_motion(data["rots"], data["centers"],
                                               mcfg, jax.random.PRNGKey(6),
                                               init_noise=0.01)
        ocfg = OptimizationConfig(
            iterations=1000, curve_start_iter=1, curve_end_iter=1000,
            densify_from_iter=10_000, opacity_reset_interval=10_000,
            curve_alignment_lr=1e-2, curve_alignment_start=1,
        )
        st = step_lib.TrainStatics(
            gcfg=gcfg, mcfg=mcfg, ocfg=ocfg, rcfg=rcfg, cs=data["cs"],
            sh_degree=1, n_sub=5, tone_mapping="identity",
            spatial_lr_scale=2.0,
        )
        state = step_lib.init_state(params, motion_params, aux,
                                    jax.random.PRNGKey(7))
        fn = step_lib.make_train_step(st)
        nu0 = np.asarray(state.motion.nu).copy()
        for it in range(4):
            state, metrics = fn(state, data["gts"][it % 2],
                                jnp.int32(it % 2), data["proj"])
        assert np.isfinite(float(metrics.loss))
        mu_nu = np.asarray(state.adam_m.mu.nu)
        assert np.isfinite(mu_nu).all()
        assert np.abs(mu_nu).max() > 0.0, "nu got no gradient"
        assert np.isfinite(np.asarray(state.motion.nu)).all()
        assert np.abs(np.asarray(state.motion.nu) - nu0).max() > 0.0

    def test_curve_frozen_before_start(self):
        data = build_synthetic(jax.random.PRNGKey(8), n_cams=2)
        gcfg, rcfg = data["gcfg"], data["rcfg"]
        params, aux = gm.create_from_pcd(data["pts"], data["cols"], gcfg,
                                         capacity=64)
        mcfg = motion_lib.MotionConfig(curve_order=3, n_subframes=5)
        motion_params = motion_lib.init_motion(data["rots"], data["centers"],
                                               mcfg, jax.random.PRNGKey(9))
        ocfg = OptimizationConfig(curve_start_iter=1000,
                                  densify_from_iter=10_000,
                                  opacity_reset_interval=10_000)
        st = step_lib.TrainStatics(
            gcfg=gcfg, mcfg=mcfg, ocfg=ocfg, rcfg=rcfg, cs=data["cs"],
            sh_degree=1, n_sub=1, tone_mapping="identity",
        )
        state = step_lib.init_state(params, motion_params, aux,
                                    jax.random.PRNGKey(10))
        fn = step_lib.make_train_step(st)
        m0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.motion)
        for it in range(3):
            state, _ = fn(state, data["gts"][0], jnp.int32(0), data["proj"])
        for a, b in zip(jax.tree.leaves(state.motion), jax.tree.leaves(m0)):
            np.testing.assert_array_equal(np.asarray(a), b)

    def test_curve_frozen_after_end(self):
        data = build_synthetic(jax.random.PRNGKey(12), n_cams=2)
        gcfg, rcfg = data["gcfg"], data["rcfg"]
        params, aux = gm.create_from_pcd(data["pts"], data["cols"], gcfg,
                                         capacity=64)
        mcfg = motion_lib.MotionConfig(curve_order=3, n_subframes=4)
        motion_params = motion_lib.init_motion(data["rots"], data["centers"],
                                               mcfg, jax.random.PRNGKey(13))
        ocfg = OptimizationConfig(curve_start_iter=1, curve_end_iter=1,
                                  densify_from_iter=10_000,
                                  opacity_reset_interval=10_000)
        st = step_lib.TrainStatics(
            gcfg=gcfg, mcfg=mcfg, ocfg=ocfg, rcfg=rcfg, cs=data["cs"],
            sh_degree=1, n_sub=4, tone_mapping="identity")
        state = step_lib.init_state(params, motion_params, aux,
                                    jax.random.PRNGKey(14))
        fn = step_lib.make_train_step(st)
        m0 = jax.tree.map(lambda x: np.asarray(x).copy(), state.motion)
        for it in range(3):
            state, _ = fn(state, data["gts"][0], jnp.int32(0), data["proj"])
        for a, b in zip(jax.tree.leaves(state.motion), jax.tree.leaves(m0)):
            np.testing.assert_array_equal(np.asarray(a), b)

    def test_quat_cartesian_training(self):
        data = build_synthetic(jax.random.PRNGKey(15), n_cams=2)
        gcfg, rcfg = data["gcfg"], data["rcfg"]
        params, aux = gm.create_from_pcd(data["pts"], data["cols"], gcfg,
                                         capacity=64)
        mcfg = motion_lib.MotionConfig(curve_order=3, n_subframes=4,
                                       curve_type="quarternion_cartesian")
        motion_params = motion_lib.init_motion(data["rots"], data["centers"],
                                               mcfg, jax.random.PRNGKey(16),
                                               init_noise=0.005)
        ocfg = OptimizationConfig(curve_start_iter=1, densify_from_iter=10_000,
                                  opacity_reset_interval=10_000)
        st = step_lib.TrainStatics(
            gcfg=gcfg, mcfg=mcfg, ocfg=ocfg, rcfg=rcfg, cs=data["cs"],
            sh_degree=1, n_sub=4, tone_mapping="identity")
        state = step_lib.init_state(params, motion_params, aux,
                                    jax.random.PRNGKey(17))
        fn = step_lib.make_train_step(st)
        m0 = np.asarray(state.motion.rot_ctrl).copy()
        for it in range(3):
            state, metrics = fn(state, data["gts"][0], jnp.int32(0),
                                data["proj"])
        assert np.isfinite(float(metrics.loss))
        assert np.abs(np.asarray(state.motion.rot_ctrl) - m0).max() > 0
        assert state.motion.rot_ctrl.shape[-1] == 4  # quaternion controls


class TestBlurQuery:
    def test_query_matches_manual_mean(self):
        from deblurgs_tpu.models import blur as blur_lib

        data = build_synthetic(jax.random.PRNGKey(20), n_cams=2)
        gcfg, rcfg = data["gcfg"], data["rcfg"]
        params, aux = gm.create_from_pcd(data["pts"], data["cols"], gcfg,
                                         capacity=64)
        mcfg = motion_lib.MotionConfig(curve_order=3, n_subframes=4)
        motion_params = motion_lib.init_motion(
            data["rots"], data["centers"], mcfg, jax.random.PRNGKey(21),
            init_noise=0.01)
        out = blur_lib.query(
            params, aux, motion_params, jnp.int32(0), data["proj"],
            data["cs"], gcfg=gcfg, mcfg=mcfg, rcfg=rcfg, sh_degree=1,
            background=jnp.zeros(3))
        assert out.subframes.shape[0] == 4
        np.testing.assert_allclose(
            np.asarray(out.blurred),
            np.asarray(out.subframes.mean(0)), atol=1e-6)
        # subframes actually differ (curve noise)
        assert float(jnp.abs(out.subframes[0] - out.subframes[-1]).max()) > 0


class TestReferenceStepOrdering:
    """Pins the reference's event/step ordering (``train.py:187-210``):
    densify & opacity-reset run BEFORE ``optimizer.step()`` and the surgered
    tensors — having no grads — skip that iteration's Adam update entirely
    (moments and step count included); the final iteration skips the step."""

    def _setup(self, ocfg, n_sub=1, key=30):
        data = build_synthetic(jax.random.PRNGKey(key), n_cams=2)
        gcfg, rcfg = data["gcfg"], data["rcfg"]
        params, aux = gm.create_from_pcd(data["pts"], data["cols"], gcfg,
                                         capacity=64)
        mcfg = motion_lib.MotionConfig(
            curve_order=3, n_subframes=n_sub if n_sub > 1 else 4)
        motion_params = motion_lib.init_motion(data["rots"], data["centers"],
                                               mcfg, jax.random.PRNGKey(31),
                                               init_noise=0.01)
        st = step_lib.TrainStatics(
            gcfg=gcfg, mcfg=mcfg, ocfg=ocfg, rcfg=rcfg, cs=data["cs"],
            sh_degree=1, n_sub=n_sub, tone_mapping="identity",
            spatial_lr_scale=2.0,
            white_background=getattr(ocfg, "_test_white_bg", False))
        state = step_lib.init_state(params, motion_params, aux,
                                    jax.random.PRNGKey(32))
        return data, st, state

    def test_densify_iteration_skips_gaussian_adam(self):
        # huge threshold + healthy opacities ⇒ the densify event is a
        # surgical no-op, isolating the "fresh tensors don't step" skip
        ocfg = OptimizationConfig(
            iterations=10_000, curve_start_iter=1, curve_end_iter=10_000,
            densify_from_iter=10, densification_interval=100,
            densify_until_iter=9_000, opacity_reset_interval=100_000,
            densify_grad_threshold_init=1e9, densify_grad_threshold_final=1e9,
        )
        data, st, state = self._setup(ocfg, n_sub=2)
        state = state._replace(step=jnp.int32(200))  # densify iteration
        fn = step_lib.make_train_step(st)
        new_state, metrics = fn(state, data["gts"][0], jnp.int32(0),
                                data["proj"])
        # gaussian params/moments/steps untouched; motion stepped
        for a, b in zip(jax.tree.leaves(new_state.params),
                        jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(new_state.adam_g.step),
                        jax.tree.leaves(state.adam_g.step)):
            assert int(a) == int(b)
        assert np.abs(np.asarray(new_state.motion.trans_ctrl)
                      - np.asarray(state.motion.trans_ctrl)).max() > 0

    def test_non_densify_iteration_steps(self):
        ocfg = OptimizationConfig(
            iterations=10_000, curve_start_iter=1, curve_end_iter=10_000,
            densify_from_iter=10, densification_interval=100,
            densify_until_iter=9_000, opacity_reset_interval=100_000,
            densify_grad_threshold_init=1e9, densify_grad_threshold_final=1e9,
        )
        data, st, state = self._setup(ocfg, n_sub=2)
        state = state._replace(step=jnp.int32(201))  # NOT a densify iteration
        fn = step_lib.make_train_step(st)
        new_state, _ = fn(state, data["gts"][0], jnp.int32(0), data["proj"])
        assert np.abs(np.asarray(new_state.params.xyz)
                      - np.asarray(state.params.xyz)).max() > 0
        assert int(jax.tree.leaves(new_state.adam_g.step)[0]) == \
            int(jax.tree.leaves(state.adam_g.step)[0]) + 1

    def test_reset_iteration_resets_then_skips_opacity_adam(self):
        from deblurgs_tpu.models import densify as densify_lib
        from deblurgs_tpu.train import optim

        ocfg = OptimizationConfig(
            iterations=10_000, curve_start_iter=10_000,
            densify_from_iter=10_000, densification_interval=97,
            densify_until_iter=9_000, opacity_reset_interval=300,
        )
        data, st, state = self._setup(ocfg)
        state = state._replace(step=jnp.int32(300))  # reset iteration
        fn = step_lib.make_train_step(st)
        new_state, _ = fn(state, data["gts"][0], jnp.int32(0), data["proj"])
        # opacity equals the pure reset of the PRE-step params (no Adam on top)
        expect, _ = densify_lib.reset_opacity(state.params, state.adam_g,
                                              st.gcfg)
        np.testing.assert_array_equal(np.asarray(new_state.params.opacity),
                                      np.asarray(expect.opacity))
        # opacity moments zeroed, step count frozen; xyz still stepped
        assert float(jnp.abs(new_state.adam_g.mu.opacity).max()) == 0.0
        assert int(new_state.adam_g.step.opacity) == int(state.adam_g.step.opacity)
        assert int(new_state.adam_g.step.xyz) == int(state.adam_g.step.xyz) + 1
        assert np.abs(np.asarray(new_state.params.xyz)
                      - np.asarray(state.params.xyz)).max() > 0

    def test_final_iteration_skips_optimizer(self):
        ocfg = OptimizationConfig(
            iterations=500, curve_start_iter=1, curve_end_iter=10_000,
            densify_from_iter=10_000, opacity_reset_interval=100_000,
        )
        data, st, state = self._setup(ocfg, n_sub=2)
        state = state._replace(step=jnp.int32(500))  # == iterations
        fn = step_lib.make_train_step(st)
        new_state, _ = fn(state, data["gts"][0], jnp.int32(0), data["proj"])
        for a, b in zip(jax.tree.leaves(new_state.params) +
                        jax.tree.leaves(new_state.motion),
                        jax.tree.leaves(state.params) +
                        jax.tree.leaves(state.motion)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(new_state.step) == 501

    def test_white_background_extra_reset(self):
        from deblurgs_tpu.models import densify as densify_lib

        ocfg = OptimizationConfig(
            iterations=10_000, curve_start_iter=10_000,
            densify_from_iter=500, densification_interval=97,
            densify_until_iter=9_000, opacity_reset_interval=100_000,
        )
        object.__setattr__(ocfg, "_test_white_bg", True)
        data, st, state = self._setup(ocfg)
        assert st.white_background
        state = state._replace(step=jnp.int32(500))  # == densify_from_iter
        fn = step_lib.make_train_step(st)
        new_state, _ = fn(state, data["gts"][0], jnp.int32(0), data["proj"])
        expect, _ = densify_lib.reset_opacity(state.params, state.adam_g,
                                              st.gcfg)
        np.testing.assert_array_equal(np.asarray(new_state.params.opacity),
                                      np.asarray(expect.opacity))


class TestBatchedRenderStep:
    def test_batched_step_matches_loop(self):
        """One blur-phase train step with render_batch (all sub-frames in
        one launch) must match the per-sub-frame loop step: same rng stream,
        same losses, same parameter updates."""
        data = build_synthetic(jax.random.PRNGKey(8), n_cams=2)
        gcfg = data["gcfg"]
        params, aux = gm.create_from_pcd(data["pts"], data["cols"], gcfg,
                                         capacity=64)
        mcfg = motion_lib.MotionConfig(curve_order=3, n_subframes=3)
        motion_params = motion_lib.init_motion(data["rots"], data["centers"],
                                               mcfg, jax.random.PRNGKey(9),
                                               init_noise=0.01)
        ocfg = OptimizationConfig(
            iterations=1000, curve_start_iter=1, curve_end_iter=1000,
            densify_from_iter=10_000, opacity_reset_interval=10_000,
        )
        rcfg = RasterizeConfig(backend="pallas", interpret=True,
                               layout="mixed", window=2, max_pairs=1 << 13,
                               k_max=256, need_n_contrib=False)
        state0 = step_lib.init_state(params, motion_params, aux,
                                     jax.random.PRNGKey(10))

        def run(batched):
            st = step_lib.TrainStatics(
                gcfg=gcfg, mcfg=mcfg, ocfg=ocfg, rcfg=rcfg, cs=data["cs"],
                sh_degree=1, n_sub=3, tone_mapping="identity",
                spatial_lr_scale=2.0, batched_render=batched)
            fn = step_lib.make_train_step(st)
            return fn(state0, data["gts"][0], jnp.int32(0), data["proj"])

        s_b, m_b = run(True)
        s_l, m_l = run(False)
        np.testing.assert_allclose(float(m_b.loss), float(m_l.loss),
                                   rtol=1e-5)
        for name in ("xyz", "opacity", "scaling"):
            np.testing.assert_allclose(
                np.asarray(getattr(s_b.params, name)),
                np.asarray(getattr(s_l.params, name)), atol=1e-5,
                err_msg=name)
        np.testing.assert_allclose(np.asarray(s_b.motion.trans_ctrl),
                                   np.asarray(s_l.motion.trans_ctrl),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_b.aux.xyz_grad_accum),
                                   np.asarray(s_l.aux.xyz_grad_accum),
                                   atol=1e-5)


class TestCameraBatchedStep:
    """``cams_per_step=B``: the batched step is the mean of B per-camera
    losses, so its pieces must decompose exactly against B=1 steps run from
    the SAME state (same rng ⇒ same bg draw; noise disabled because its
    draw depends on the gt batch shape)."""

    def _setup(self):
        data = build_synthetic(jax.random.PRNGKey(40), n_cams=4)
        gcfg, rcfg = data["gcfg"], data["rcfg"]
        params, aux = gm.create_from_pcd(data["pts"], data["cols"], gcfg,
                                         capacity=64)
        mcfg = motion_lib.MotionConfig(curve_order=3, n_subframes=3)
        motion_params = motion_lib.init_motion(data["rots"], data["centers"],
                                               mcfg, jax.random.PRNGKey(41),
                                               init_noise=0.01)
        ocfg = OptimizationConfig(
            iterations=10_000, curve_start_iter=1, curve_end_iter=10_000,
            densify_from_iter=10_000, opacity_reset_interval=100_000,
        )
        st1 = step_lib.TrainStatics(
            gcfg=gcfg, mcfg=mcfg, ocfg=ocfg, rcfg=rcfg, cs=data["cs"],
            sh_degree=1, n_sub=3, tone_mapping="identity",
            spatial_lr_scale=2.0)
        state = step_lib.init_state(params, motion_params, aux,
                                    jax.random.PRNGKey(42))
        return data, st1, state

    def test_batched_step_decomposes(self):
        import dataclasses as dc

        data, st1, state = self._setup()
        st2 = dc.replace(st1, cams_per_step=2)
        fn1 = step_lib.make_train_step(st1)
        fn2 = step_lib.make_train_step(st2)

        s0, m0 = fn1(state, data["gts"][0], jnp.int32(0), data["proj"])
        s1, m1 = fn1(state, data["gts"][1], jnp.int32(1), data["proj"])
        sel = jnp.array([0, 1], jnp.int32)
        sB, mB = fn2(state, data["gts"][sel], sel, data["proj"])

        # loss pieces decompose as means / sums
        np.testing.assert_allclose(float(mB.l1),
                                   (float(m0.l1) + float(m1.l1)) / 2,
                                   rtol=1e-5)
        np.testing.assert_allclose(
            float(mB.t_smooth),
            (float(m0.t_smooth) + float(m1.t_smooth)) / 2, rtol=1e-4)

        # densify statistics keep per-camera-visit magnitude: the batched
        # accum/denom increments are the SUM of the per-camera increments
        init_accum = np.asarray(state.aux.xyz_grad_accum)
        incB = np.asarray(sB.aux.xyz_grad_accum) - init_accum
        inc0 = np.asarray(s0.aux.xyz_grad_accum) - init_accum
        inc1 = np.asarray(s1.aux.xyz_grad_accum) - init_accum
        np.testing.assert_allclose(incB, inc0 + inc1, rtol=1e-4, atol=1e-9)
        init_den = np.asarray(state.aux.denom)
        np.testing.assert_allclose(
            np.asarray(sB.aux.denom) - init_den,
            (np.asarray(s0.aux.denom) - init_den)
            + (np.asarray(s1.aux.denom) - init_den), rtol=1e-6)

        # Adam's first step is gradient-scale invariant (m̂/√v̂ = sign·1), so
        # each camera's motion update in the batch matches its solo update
        d_solo = (np.asarray(s0.motion.trans_ctrl)
                  - np.asarray(state.motion.trans_ctrl))[0]
        d_batch = (np.asarray(sB.motion.trans_ctrl)
                   - np.asarray(state.motion.trans_ctrl))[0]
        np.testing.assert_allclose(d_batch, d_solo, rtol=1e-3, atol=1e-9)

    def test_batched_matches_single_when_duplicated(self):
        """B=2 with the SAME camera twice == B=1 on that camera (the mean
        over the batch is a no-op), including the gaussian Adam step."""
        import dataclasses as dc

        data, st1, state = self._setup()
        st2 = dc.replace(st1, cams_per_step=2)
        fn1 = step_lib.make_train_step(st1)
        fn2 = step_lib.make_train_step(st2)

        s0, m0 = fn1(state, data["gts"][0], jnp.int32(0), data["proj"])
        sel = jnp.array([0, 0], jnp.int32)
        sB, mB = fn2(state, data["gts"][sel], sel, data["proj"])

        np.testing.assert_allclose(float(mB.loss), float(m0.loss), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sB.params.xyz),
                                   np.asarray(s0.params.xyz), atol=1e-6)
        np.testing.assert_allclose(np.asarray(sB.motion.trans_ctrl),
                                   np.asarray(s0.motion.trans_ctrl),
                                   atol=1e-6)
        # duplicated camera double-counts the densify stats by design
        init_accum = np.asarray(state.aux.xyz_grad_accum)
        np.testing.assert_allclose(
            np.asarray(sB.aux.xyz_grad_accum) - init_accum,
            2 * (np.asarray(s0.aux.xyz_grad_accum) - init_accum),
            rtol=1e-4, atol=1e-9)
