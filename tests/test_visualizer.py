"""Visualizer smoke tests (observability subsystem)."""

import os

import jax
import numpy as np
import pytest

from tests.test_data import write_colmap_binary, write_images


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("vis")
    source = str(tmp / "scene")
    model = str(tmp / "model")
    write_colmap_binary(os.path.join(source, "sparse", "0"), n_cams=3, n_pts=25)
    write_images(os.path.join(source, "images"),
                 [f"{i:03d}.png" for i in range(3)], w=64, h=48)

    from deblurgs_tpu.data.scene import Scene
    from deblurgs_tpu.models import gaussians as gm
    from deblurgs_tpu.models import motion as motion_lib
    from deblurgs_tpu.ops.rasterize import RasterizeConfig
    from deblurgs_tpu.train import step as step_lib
    import jax.numpy as jnp

    scene = Scene(source, model, resolution=1)
    gcfg = gm.GaussianConfig(sh_degree=1)
    mcfg = motion_lib.MotionConfig(curve_order=2, n_subframes=3)
    rcfg = RasterizeConfig(backend="xla", max_pairs=1 << 12, k_max=128)
    params, aux = gm.create_from_pcd(
        jnp.asarray(scene.info.point_cloud.points),
        jnp.asarray(scene.info.point_cloud.colors), gcfg, capacity=32)
    motion = motion_lib.init_motion(
        jnp.asarray(scene.rotations, jnp.float32),
        jnp.asarray(scene.centers, jnp.float32), mcfg, jax.random.PRNGKey(0))
    state = step_lib.init_state(params, motion, aux, jax.random.PRNGKey(1))
    return scene, gcfg, mcfg, rcfg, state, model


class TestVisualizer:
    def test_overview_shot_and_video(self, setup):
        scene, gcfg, mcfg, rcfg, state, model = setup
        from deblurgs_tpu.utils.visualizer import Visualizer

        vis = Visualizer(scene, gcfg, mcfg, rcfg, model,
                         total_iterations=100, n_shots=10, sh_degree=1)
        it = vis.shot_iters[1]
        img = vis.run(it, state)
        assert img is not None and img.shape == (48, 64, 3)
        assert vis.run(it + 1, state) is None  # unscheduled iteration
        assert vis.save_video() is not None

    def test_alignment_plot(self, setup):
        scene, gcfg, mcfg, rcfg, state, model = setup
        from deblurgs_tpu.utils.visualizer import Visualizer

        vis = Visualizer(scene, gcfg, mcfg, rcfg, model, total_iterations=100)
        path = vis.visualize_alignment(5, state)
        assert os.path.exists(path)

    def test_traj_render(self, setup):
        scene, gcfg, mcfg, rcfg, state, model = setup
        from deblurgs_tpu.utils.visualizer import Visualizer

        vis = Visualizer(scene, gcfg, mcfg, rcfg, model, total_iterations=100)
        out = vis.traj_render(7, state, cam_idx=0)
        assert os.path.exists(os.path.join(out, "blur.png"))
        assert os.path.exists(os.path.join(out, "error.png"))


class TestStepTimer:
    def test_timer(self, tmp_path):
        from deblurgs_tpu.utils.profiling import StepTimer

        t = StepTimer(str(tmp_path / "steps.jsonl"), flush_every=2)
        for _ in range(4):
            with t:
                pass
        assert t.count == 4
        assert os.path.exists(tmp_path / "steps.jsonl")
        t.write_time_txt(str(tmp_path))
        assert "Training Time" in open(tmp_path / "time.txt").read()
