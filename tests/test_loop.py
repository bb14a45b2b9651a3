"""Host-loop integration: CLI end-to-end on a synthetic COLMAP dataset,
phase switching, capacity growth, checkpoint round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_data import write_colmap_binary, write_images


@pytest.fixture
def dataset(tmp_path):
    root = str(tmp_path / "scene")
    write_colmap_binary(os.path.join(root, "sparse", "0"), n_cams=3, n_pts=40)
    write_images(os.path.join(root, "images"),
                 [f"{i:03d}.png" for i in range(3)], w=48, h=36)
    return root, str(tmp_path / "model")


class TestTrainerLoop:
    def test_cli_end_to_end(self, dataset):
        source, model = dataset
        from deblurgs_tpu.cli.train import main

        state = main([
            "-s", source, "-m", model,
            "--iterations", "30",
            "--curve_start_iter", "10",
            "--densify_from_iter", "12",
            "--densification_interval", "10",
            "--densify_until_iter", "25",
            "--opacity_reset_interval", "1000",
            "--num_subframes", "3",
            "--curve_order", "2",
            "--backend", "xla",
            "--max_pairs", str(1 << 12),
            "--save_iterations", "20",
            "--checkpoint_iterations", "20",
            "--resolution", "1",
        ])
        assert np.isfinite(float(state.step))
        # artifacts (reference train.py outputs)
        assert os.path.exists(os.path.join(model, "args.txt"))
        assert os.path.exists(os.path.join(model, "cfg_args"))
        assert os.path.exists(os.path.join(model, "input.ply"))
        assert os.path.exists(os.path.join(model, "cameras.json"))
        assert os.path.exists(os.path.join(model, "time.txt"))
        assert os.path.exists(os.path.join(model, "cm.npz"))
        assert os.path.exists(os.path.join(model, "chkpnt20.npz"))
        assert os.path.exists(os.path.join(
            model, "point_cloud", "iteration_20", "point_cloud.ply"))
        assert os.path.exists(os.path.join(
            model, "point_cloud", "iteration_30", "point_cloud.ply"))
        # post-training render spawns (reference train.py:230-233)
        assert os.path.isdir(os.path.join(model, "spiral", "iteration_30"))
        assert os.path.isdir(os.path.join(model, "trainview", "iteration_30"))

    def test_checkpoint_roundtrip(self, dataset):
        source, model = dataset
        from deblurgs_tpu.cli.args import ModelParams, OptimizationParams
        from deblurgs_tpu.cli.train import build_configs
        from argparse import ArgumentParser

        parser = ArgumentParser()
        lp, op = ModelParams(parser), OptimizationParams(parser)
        args = parser.parse_args(["-s", source, "-m", model,
                                  "--num_subframes", "3",
                                  "--curve_order", "2", "--backend", "xla",
                                  "--max_pairs", str(1 << 12)])
        gcfg, mcfg, ocfg, rcfg = build_configs(lp.extract(args), op.extract(args))

        from deblurgs_tpu.data.scene import Scene
        from deblurgs_tpu.train import checkpoint as ckpt
        from deblurgs_tpu.train.loop import Trainer

        scene = Scene(source, model, resolution=1)
        tr = Trainer(scene=scene, gcfg=gcfg, mcfg=mcfg, ocfg=ocfg, rcfg=rcfg,
                     model_path=model, tone_mapping="identity")
        state, _ = tr.init_state()
        path = os.path.join(model, "ck.npz")
        ckpt.save_checkpoint(path, state)
        state2 = ckpt.load_checkpoint(path, state)
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_grow_capacity(self):
        from deblurgs_tpu.models import gaussians as gm
        from deblurgs_tpu.train import optim
        from deblurgs_tpu.train import step as step_lib
        from deblurgs_tpu.train.loop import grow_capacity
        from deblurgs_tpu.models import motion as motion_lib
        from deblurgs_tpu.core import lie

        cfg = gm.GaussianConfig(sh_degree=1)
        pts = jax.random.normal(jax.random.PRNGKey(0), (10, 3))
        params, aux = gm.create_from_pcd(pts, jnp.full((10, 3), 0.5), cfg, 16)
        motion = motion_lib.init_motion(
            lie.so3_exp_map(jnp.zeros((1, 3))), jnp.zeros((1, 3)),
            motion_lib.MotionConfig(curve_order=2, n_subframes=3),
            jax.random.PRNGKey(1))
        state = step_lib.init_state(params, motion, aux, jax.random.PRNGKey(2))
        state = state._replace(
            adam_g=state.adam_g._replace(
                mu=jax.tree.map(lambda x: x + 1.0, state.adam_g.mu)))
        s2 = grow_capacity(state, 32)
        assert s2.params.xyz.shape == (32, 3)
        assert int(gm.num_active(s2.aux)) == 10
        assert (np.asarray(s2.adam_g.mu.xyz[:16]) == 1.0).all()
        assert (np.asarray(s2.adam_g.mu.xyz[16:]) == 0.0).all()
        assert (np.asarray(s2.params.rotation[16:, 0]) == 1.0).all()

    def test_capacity_pre_grow(self, dataset):
        """The Trainer grows capacity when active count crosses 90% —
        BEFORE any densify insertion is dropped (dropped rows are lost,
        not retried, so the reactive path alone loses them)."""
        source, model = dataset
        from argparse import ArgumentParser
        from deblurgs_tpu.cli.args import ModelParams, OptimizationParams
        from deblurgs_tpu.cli.train import build_configs
        from deblurgs_tpu.data.scene import Scene
        from deblurgs_tpu.train.loop import Trainer

        parser = ArgumentParser()
        lp, op = ModelParams(parser), OptimizationParams(parser)
        args = parser.parse_args([
            "-s", source, "-m", model, "--num_subframes", "3",
            "--curve_order", "2", "--backend", "xla",
            "--max_pairs", str(1 << 12),
            # densify never fires — only the pre-grow heuristic can grow
            "--densify_from_iter", "1000",
            "--opacity_reset_interval", "1000",
        ])
        gcfg, mcfg, ocfg, rcfg = build_configs(lp.extract(args),
                                               op.extract(args))
        scene = Scene(source, model, resolution=1)
        tr = Trainer(scene=scene, gcfg=gcfg, mcfg=mcfg, ocfg=ocfg, rcfg=rcfg,
                     model_path=model, tone_mapping="identity",
                     sync_every=2)
        # 40 active points in a capacity-41 state: 40 > 0.9*41
        state, _ = tr.init_state(capacity=41)
        assert state.params.xyz.shape[0] == 41
        state = tr.train(state, first_iter=1, iterations=4)
        assert state.params.xyz.shape[0] == 82
        assert int(np.asarray(state.aux.active).sum()) == 40


class TestPhaseTransitions:
    def test_sharp_to_blur_switch(self, dataset):
        """Crossing curve_start_iter mid-run switches to the f-sub-frame
        compiled variant and keeps training stable."""
        source, model = dataset
        from argparse import ArgumentParser
        from deblurgs_tpu.cli.args import ModelParams, OptimizationParams
        from deblurgs_tpu.cli.train import build_configs
        from deblurgs_tpu.data.scene import Scene
        from deblurgs_tpu.train.loop import Trainer

        parser = ArgumentParser()
        lp, op = ModelParams(parser), OptimizationParams(parser)
        args = parser.parse_args([
            "-s", source, "-m", model, "--num_subframes", "3",
            "--curve_order", "2", "--backend", "xla",
            "--max_pairs", str(1 << 12), "--curve_start_iter", "4",
            "--densify_from_iter", "1000",
            "--opacity_reset_interval", "1000"])
        gcfg, mcfg, ocfg, rcfg = build_configs(lp.extract(args), op.extract(args))
        scene = Scene(source, None, resolution=1)
        tr = Trainer(scene=scene, gcfg=gcfg, mcfg=mcfg, ocfg=ocfg, rcfg=rcfg,
                     tone_mapping="identity")
        state, first = tr.init_state()
        # phase statics flip at curve_start_iter
        assert tr.phase_statics(3)[1] == 1
        assert tr.phase_statics(4)[1] == 3
        state = tr.train(state, first, iterations=8)
        assert int(state.step) == 9
        assert len(tr._step_cache) == 2  # one per phase


class TestNaNGuard:
    def test_debug_dumps_snapshot_on_nonfinite_loss(self, dataset, tmp_path):
        """Debug mode must dump a post-mortem snapshot and abort when the
        loss goes non-finite (reference snapshot_fw/bw.dump analog)."""
        import jax.numpy as jnp
        import pytest

        from deblurgs_tpu.cli.train import build_configs, main

        source, model = dataset
        model = str(tmp_path / "nan_model")
        # poison the GT image stack after trainer construction via a
        # monkeypatched Scene: easiest is to train normally but inject a
        # NaN into the image stack through a tiny subclass hook
        from deblurgs_tpu.data.scene import Scene
        from deblurgs_tpu.train.loop import Trainer
        from deblurgs_tpu.models.gaussians import GaussianConfig
        from deblurgs_tpu.models.motion import MotionConfig
        from deblurgs_tpu.ops.rasterize import RasterizeConfig
        from deblurgs_tpu.train.config import OptimizationConfig
        import jax
        import numpy as np
        import os

        scene = Scene(source, model, resolution=1)
        scene.train_images[1] = np.nan
        trainer = Trainer(
            scene=scene,
            gcfg=GaussianConfig(sh_degree=1),
            mcfg=MotionConfig(curve_order=2, n_subframes=3),
            ocfg=OptimizationConfig(
                iterations=12, curve_start_iter=4,
                densify_from_iter=1000, opacity_reset_interval=1000),
            rcfg=RasterizeConfig(backend="xla", max_pairs=1 << 12),
            tone_mapping="identity", model_path=model,
            save_iterations=(), sync_every=2, debug=True,
        )
        state, first = trainer.init_state(key=jax.random.PRNGKey(0))
        with pytest.raises(FloatingPointError, match="non-finite"):
            trainer.train(state, first, iterations=12)
        snaps = [f for f in os.listdir(model) if f.startswith("snapshot_nan")]
        assert snaps, os.listdir(model)
