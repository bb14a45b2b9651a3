"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4.5):
sharded sub-frame rendering must equal the single-device path, and the full
sharded train step must run and match."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblurgs_tpu.models import gaussians as gm
from deblurgs_tpu.models import motion as motion_lib
from deblurgs_tpu.parallel import make_mesh
from deblurgs_tpu.train import step as step_lib
from deblurgs_tpu.train.config import OptimizationConfig
from tests.test_train import build_synthetic


@pytest.fixture(scope="module")
def setup():
    data = build_synthetic(jax.random.PRNGKey(42), n_cams=2)
    gcfg = data["gcfg"]
    params, aux = gm.create_from_pcd(data["pts"], data["cols"], gcfg, capacity=64)
    mcfg = motion_lib.MotionConfig(curve_order=3, n_subframes=8)
    motion_params = motion_lib.init_motion(
        data["rots"], data["centers"], mcfg, jax.random.PRNGKey(1),
        init_noise=0.005,
    )
    return data, params, aux, mcfg, motion_params


def make_statics(data, mcfg, mesh):
    ocfg = OptimizationConfig(curve_start_iter=1, densify_from_iter=10_000,
                              opacity_reset_interval=10_000)
    return step_lib.TrainStatics(
        gcfg=data["gcfg"], mcfg=mcfg, ocfg=ocfg, rcfg=data["rcfg"],
        cs=data["cs"], sh_degree=1, n_sub=8, tone_mapping="identity",
        spatial_lr_scale=2.0, mesh=mesh,
    )


class TestSharding:
    def test_mesh_has_8_devices(self):
        mesh = make_mesh()
        assert mesh.size == 8

    def test_sharded_step_matches_single_device(self, setup):
        data, params, aux, mcfg, motion_params = setup
        results = {}
        for name, mesh in [("single", None), ("sharded", make_mesh())]:
            st = make_statics(data, mcfg, mesh)
            state = step_lib.init_state(params, motion_params, aux,
                                        jax.random.PRNGKey(9))
            fn = step_lib.make_train_step(st)
            for it in range(2):
                state, metrics = fn(state, data["gts"][0], jnp.int32(0),
                                    data["proj"])
            results[name] = (state, metrics)

        m_single, m_shard = results["single"][1], results["sharded"][1]
        np.testing.assert_allclose(float(m_shard.loss), float(m_single.loss),
                                   rtol=1e-4)
        s_single, s_shard = results["single"][0], results["sharded"][0]
        for a, b in zip(jax.tree.leaves(s_single.params),
                        jax.tree.leaves(s_shard.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)
        for a, b in zip(jax.tree.leaves(s_single.motion),
                        jax.tree.leaves(s_shard.motion)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)

    def test_sharded_step_runs_on_2_devices(self, setup):
        data, params, aux, mcfg, motion_params = setup
        st = make_statics(data, mcfg, make_mesh(2))
        state = step_lib.init_state(params, motion_params, aux,
                                    jax.random.PRNGKey(3))
        fn = step_lib.make_train_step(st)
        state, metrics = fn(state, data["gts"][0], jnp.int32(0), data["proj"])
        assert np.isfinite(float(metrics.loss))

    def test_sharded_batched_render_matches(self, setup):
        """Mesh-sharded sub-frames with each device's block rendered in ONE
        batched launch == the unsharded batched step."""
        from deblurgs_tpu.ops.rasterize import RasterizeConfig

        data, params, aux, mcfg, motion_params = setup
        rcfg = RasterizeConfig(backend="pallas", interpret=True,
                               layout="mixed", window=2, max_pairs=1 << 13,
                               k_max=256, need_n_contrib=False)
        ocfg = OptimizationConfig(curve_start_iter=1,
                                  densify_from_iter=10_000,
                                  opacity_reset_interval=10_000)
        results = {}
        for name, mesh in [("single", None), ("sharded", make_mesh(2))]:
            st = step_lib.TrainStatics(
                gcfg=data["gcfg"], mcfg=mcfg, ocfg=ocfg, rcfg=rcfg,
                cs=data["cs"], sh_degree=1, n_sub=8,
                tone_mapping="identity", spatial_lr_scale=2.0, mesh=mesh,
                batched_render=True)
            state = step_lib.init_state(params, motion_params, aux,
                                        jax.random.PRNGKey(9))
            fn = step_lib.make_train_step(st)
            state, metrics = fn(state, data["gts"][0], jnp.int32(0),
                                data["proj"])
            results[name] = (state, metrics)
        m_s, m_sh = results["single"][1], results["sharded"][1]
        np.testing.assert_allclose(float(m_sh.loss), float(m_s.loss),
                                   rtol=1e-4)
        for a, b in zip(jax.tree.leaves(results["single"][0].params),
                        jax.tree.leaves(results["sharded"][0].params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)
