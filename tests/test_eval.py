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
        "--save_iterations", "8", "--skip_final_render",
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

    def test_shared_adam_matches_torch(self):
        """Reference semantics (test.py:154-158): ONE torch Adam over the
        full [n,...] pose tensors. A step for view i leaves zero grads on
        every other row, but torch still decays their moments and drifts
        their params with one GLOBAL step count — replicate bit-for-bit
        against torch.optim.Adam on the same step sequence."""
        import torch

        from deblurgs_tpu.eval.pose_opt import (
            PoseParams, init_shared_adam, shared_adam_update,
        )

        rng = np.random.RandomState(0)
        q0 = rng.randn(3, 4).astype(np.float32)
        t0 = rng.randn(3, 3).astype(np.float32)
        lr_rot, lr_trans = 5e-5, 5e-4

        tq = torch.nn.Parameter(torch.from_numpy(q0.copy()))
        tt = torch.nn.Parameter(torch.from_numpy(t0.copy()))
        opt = torch.optim.Adam(
            [{"params": [tq], "lr": lr_rot}, {"params": [tt], "lr": lr_trans}],
            lr=lr_trans, eps=1e-15)

        pose = PoseParams(quat=jnp.asarray(q0), trans=jnp.asarray(t0))
        st = init_shared_adam(pose)
        lr = PoseParams(quat=lr_rot, trans=lr_trans)

        # visit views 0, 2, 0, 1 — interleaved, rows w/o grads must drift
        for step_i, idx in enumerate([0, 2, 0, 1]):
            gq = np.zeros((3, 4), np.float32)
            gt_ = np.zeros((3, 3), np.float32)
            gq[idx] = rng.randn(4).astype(np.float32)
            gt_[idx] = rng.randn(3).astype(np.float32)

            opt.zero_grad()
            tq.grad = torch.from_numpy(gq.copy())
            tt.grad = torch.from_numpy(gt_.copy())
            opt.step()

            g = PoseParams(quat=jnp.asarray(gq), trans=jnp.asarray(gt_))
            pose, st = shared_adam_update(pose, g, st, lr)

        np.testing.assert_allclose(np.asarray(pose.quat),
                                   tq.detach().numpy(), rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(pose.trans),
                                   tt.detach().numpy(), rtol=1e-5, atol=1e-7)
        # after 2 steps of view 0 and 1 of view 2, view 1's row has moved
        # purely by shared-optimizer drift (zero grads so far at step 3)
        assert int(st.step) == 4


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
        import sys
        sys.path.insert(0, ".")
        from deblurgs_tpu.eval.metrics import LPIPS
        from scripts.convert_lpips_weights import random_weights

        path = str(tmp_path / "lpips.npz")
        np.savez(path, **random_weights("vgg", seed=0))
        lp = LPIPS.from_file(path)
        assert lp.net_type == "vgg"
        rng = np.random.RandomState(0)
        a = jnp.asarray(rng.rand(32, 32, 3), jnp.float32)
        b = jnp.asarray(rng.rand(32, 32, 3), jnp.float32)
        assert float(lp(a, a)) < 1e-9
        assert float(lp(a, b)) > 0

    @pytest.mark.parametrize("net_type", ["vgg", "alex"])
    def test_lpips_matches_torch_reference_math(self, net_type, tmp_path):
        """Golden parity: the JAX LPIPS pipeline against an independent torch
        transliteration of the reference semantics (z_score on [0,1] input,
        ``x/(norm+eps)`` activation normalization, squared diff, 1x1 lin
        head, spatial mean, tap sum — ``lpipsPyTorch/modules/``), driven by
        the converter's fixed-seed weights on 3 fixed image pairs. With real
        pretrained checkpoints the converter emits the same layout, so this
        pins everything except the literal pretrained values."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        from deblurgs_tpu.eval.metrics import LPIPS, LPIPS_ARCHS, _SHIFT, _SCALE
        from scripts.convert_lpips_weights import random_weights

        weights = random_weights(net_type, seed=3)
        arch = LPIPS_ARCHS[net_type]

        def torch_lpips(x_np, y_np):
            def feats(img):
                x = torch.from_numpy(
                    np.transpose((img - _SHIFT) / _SCALE, (2, 0, 1))
                )[None].double()
                outs = []
                ci = 0
                for spec in arch["layers"]:
                    if spec[0] == "max":
                        _, k, s = spec
                        x = F.max_pool2d(x, k, stride=s)
                        continue
                    _, k, s, p, _c = spec
                    w = torch.from_numpy(
                        np.transpose(weights[f"conv{ci}/w"], (3, 2, 0, 1))
                    ).double()
                    b = torch.from_numpy(weights[f"conv{ci}/b"]).double()
                    x = F.relu(F.conv2d(x, w, b, stride=s, padding=p))
                    if ci in arch["taps"]:
                        n = torch.sqrt((x ** 2).sum(dim=1, keepdim=True))
                        outs.append(x / (n + 1e-10))
                    ci += 1
                return outs

            fx, fy = feats(x_np), feats(y_np)
            total = 0.0
            for j, (a, b) in enumerate(zip(fx, fy)):
                d = (a - b) ** 2
                w = torch.from_numpy(
                    np.transpose(weights[f"lin{j}/w"], (3, 2, 0, 1))
                ).double()
                total = total + F.conv2d(d, w).mean(dim=(2, 3))
            return float(total[0, 0])

        lp = LPIPS(weights, net_type=net_type)
        rng = np.random.RandomState(11)
        for _ in range(3):
            a = rng.rand(64, 64, 3).astype(np.float32)
            b = np.clip(a + 0.1 * rng.randn(64, 64, 3), 0, 1).astype(np.float32)
            ours = float(lp(jnp.asarray(a), jnp.asarray(b)))
            ref = torch_lpips(a, b)
            np.testing.assert_allclose(ours, ref, rtol=2e-4,
                                       err_msg=f"net_type={net_type}")

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
