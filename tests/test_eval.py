"""Eval-layer tests: trained-session loading, spiral/trainview export,
pose refinement, metrics aggregation, LPIPS mechanism."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_data import write_colmap_binary, write_images


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("run")
    source = str(tmp / "scene")
    model = str(tmp / "model")
    write_colmap_binary(os.path.join(source, "sparse", "0"), n_cams=3, n_pts=30)
    write_images(os.path.join(source, "images"),
                 [f"{i:03d}.png" for i in range(3)], w=64, h=48)
    from deblurgs_tpu.cli.train import main

    main([
        "-s", source, "-m", model, "--iterations", "8",
        "--curve_start_iter", "4", "--num_subframes", "3",
        "--curve_order", "2", "--backend", "xla",
        "--max_pairs", str(1 << 12), "--densify_from_iter", "1000",
        "--opacity_reset_interval", "1000", "--resolution", "1",
        "--save_iterations", "8",
    ])
    return source, model


class TestSession:
    def test_load_and_render(self, trained_model):
        source, model = trained_model
        from deblurgs_tpu.eval.session import load_session, render_view
        from deblurgs_tpu.core.camera import make_camera_arrays, c2w_to_view

        s = load_session(model, source)
        assert s.iteration == 8
        assert s.params.xyz.shape[0] >= 30
        cam = make_camera_arrays(
            c2w_to_view(jnp.eye(3), jnp.array([0.0, 0, -4])),
            jnp.asarray(s.scene.proj))
        img, depth = render_view(s, cam)
        assert img.shape == (48, 64, 3)
        assert np.isfinite(np.asarray(img)).all()

    def test_spiral_cli(self, trained_model):
        source, model = trained_model
        from deblurgs_tpu.cli.render_spiral import main

        out = main(["-m", model, "-s", source, "--n_frames", "4"])
        files = os.listdir(out)
        assert any("spiral_rgb" in f for f in files)

    def test_trainview_cli(self, trained_model):
        source, model = trained_model
        from deblurgs_tpu.cli.render_trainview import main

        out = main(["-m", model, "-s", source])
        assert os.path.exists(os.path.join(out, "000.png"))


class TestPoseOpt:
    def test_pose_refinement_recovers_perturbation(self, trained_model):
        """Render GT from true poses, perturb, refine, check improvement."""
        source, model = trained_model
        from deblurgs_tpu.eval.pose_opt import (
            init_pose_params, optimize_test_poses, pose_to_camera,
        )
        from deblurgs_tpu.eval.session import load_session, render_view
        from deblurgs_tpu.train.losses import l1_loss

        s = load_session(model, source)
        proj = jnp.asarray(s.scene.proj)
        # synthesize "test" GT at known poses (take the first train pose)
        R = jnp.asarray(s.scene.rotations[:1], jnp.float32)
        T_w2c = -jnp.einsum("nij,nj->ni",
                            jnp.swapaxes(R, 1, 2),
                            jnp.asarray(s.scene.centers[:1], jnp.float32))
        pose_true = init_pose_params(R, T_w2c)
        cam = pose_to_camera(pose_true, 0, proj)
        gt, _ = render_view(s, cam)
        gts = gt[None]

        # perturb translation
        T_bad = T_w2c + jnp.array([[0.05, -0.03, 0.02]])
        pose0 = init_pose_params(R, T_bad)
        img0, _ = render_view(s, pose_to_camera(pose0, 0, proj))
        loss_before = float(l1_loss(img0, gt))

        pose_fit = optimize_test_poses(
            s, gts, R, T_bad, proj, num_iter_per_view=60, verbose=False,
            lr_trans=5e-3)
        img1, _ = render_view(s, pose_to_camera(pose_fit, 0, proj))
        loss_after = float(l1_loss(img1, gt))
        assert loss_after < 0.7 * loss_before, (loss_before, loss_after)


class TestMetrics:
    def test_evaluate_and_write(self, tmp_path):
        from deblurgs_tpu.eval import metrics as m

        rng = np.random.RandomState(0)
        gts = [rng.rand(16, 16, 3).astype(np.float32) for _ in range(2)]
        renders = [np.clip(g + 0.01 * rng.randn(16, 16, 3), 0, 1).astype(np.float32)
                   for g in gts]
        agg, per_view = m.evaluate_pairs(renders, gts, lpips=None)
        assert agg["PSNR"] > 30
        assert 0.5 < agg["SSIM"] <= 1.0
        assert agg["LPIPS"] is None
        m.write_results(str(tmp_path), "fit", agg, per_view, ["a.png", "b.png"])
        res = json.load(open(tmp_path / "results.json"))
        assert "fit" in res and "PSNR" in res["fit"]

    def test_lpips_mechanism(self, tmp_path):
        """Random-weight LPIPS must run and be 0 for identical images."""
        from deblurgs_tpu.eval.metrics import LPIPS, _VGG_CFG, _FEATURE_TAPS

        rng = np.random.RandomState(0)
        weights = {}
        cin = 3
        ci = 0
        taps = []
        for spec in _VGG_CFG:
            if spec == "M":
                continue
            weights[f"conv{ci}/w"] = rng.randn(3, 3, cin, spec).astype(np.float32) * 0.05
            weights[f"conv{ci}/b"] = np.zeros(spec, np.float32)
            if ci in _FEATURE_TAPS:
                taps.append(spec)
            cin = spec
            ci += 1
        for j, c in enumerate(taps):
            weights[f"lin{j}/w"] = np.abs(rng.randn(1, 1, c, 1)).astype(np.float32)
        path = str(tmp_path / "lpips.npz")
        np.savez(path, **weights)
        lp = LPIPS.from_file(path)
        a = jnp.asarray(rng.rand(32, 32, 3), jnp.float32)
        b = jnp.asarray(rng.rand(32, 32, 3), jnp.float32)
        assert float(lp(a, a)) < 1e-9
        assert float(lp(a, b)) > 0

    def test_lpips_absent_weights(self):
        from deblurgs_tpu.eval.metrics import LPIPS

        assert LPIPS.from_file("/nonexistent/path.npz") is None


class TestColmapPipeline:
    def test_gated_without_binary(self):
        from deblurgs_tpu.tools import colmap_pipeline as cp

        if cp.colmap_available():
            pytest.skip("colmap present")
        with pytest.raises(RuntimeError, match="colmap"):
            cp.run_colmap("/tmp/nonexistent")
