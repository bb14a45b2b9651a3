"""Gaussian-axis sharding (BASELINE config 5 / SURVEY §5 long-axis plan):
a train step on state sharded over the ``gs`` mesh axis must equal the
single-device step, and a sharded forward render must equal the plain one.

Runs on the 8-device virtual CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblurgs_tpu.models import gaussians as gm
from deblurgs_tpu.models import motion as motion_lib
from deblurgs_tpu.ops.rasterize import render
from deblurgs_tpu.parallel import gauss_shard
from deblurgs_tpu.train import step as step_lib
from deblurgs_tpu.train.config import OptimizationConfig
from tests.test_train import build_synthetic


@pytest.fixture(scope="module")
def setup():
    data = build_synthetic(jax.random.PRNGKey(7), n_cams=2)
    gcfg = data["gcfg"]
    params, aux = gm.create_from_pcd(data["pts"], data["cols"], gcfg,
                                     capacity=64)
    mcfg = motion_lib.MotionConfig(curve_order=3, n_subframes=4)
    motion_params = motion_lib.init_motion(
        data["rots"], data["centers"], mcfg, jax.random.PRNGKey(1),
        init_noise=0.005,
    )
    return data, params, aux, mcfg, motion_params


def make_statics(data, mcfg):
    ocfg = OptimizationConfig(curve_start_iter=1, densify_from_iter=10_000,
                              opacity_reset_interval=10_000)
    return step_lib.TrainStatics(
        gcfg=data["gcfg"], mcfg=mcfg, ocfg=ocfg, rcfg=data["rcfg"],
        cs=data["cs"], sh_degree=1, n_sub=4, tone_mapping="identity",
        spatial_lr_scale=2.0, mesh=None,
    )


class TestGaussSharding:
    def test_sharded_state_placement(self, setup):
        data, params, aux, mcfg, motion_params = setup
        mesh = gauss_shard.make_gauss_mesh(8)
        state = step_lib.init_state(params, motion_params, aux,
                                    jax.random.PRNGKey(2))
        sh = gauss_shard.shard_gauss_state(state, mesh)
        # capacity axis is split 8 ways; motion replicates
        assert sh.params.xyz.sharding.spec == (gauss_shard.GAUSS_AXIS,)
        assert sh.aux.active.sharding.spec == (gauss_shard.GAUSS_AXIS,)
        shard_shapes = {s.data.shape[0]
                        for s in sh.params.xyz.addressable_shards}
        assert shard_shapes == {64 // 8}
        assert all(s.data.shape == motion_params.nu.shape
                   for s in sh.motion.nu.addressable_shards)

    def test_gauss_sharded_step_matches_single_device(self, setup):
        data, params, aux, mcfg, motion_params = setup
        st = make_statics(data, mcfg)

        state0 = step_lib.init_state(params, motion_params, aux,
                                     jax.random.PRNGKey(9))
        fn = step_lib.make_train_step(st)
        ref = state0
        for _ in range(2):
            ref, m_ref = fn(ref, data["gts"][0], jnp.int32(0), data["proj"])

        mesh = gauss_shard.make_gauss_mesh(8)
        sh = gauss_shard.shard_gauss_state(state0, mesh)
        gfn = gauss_shard.make_gauss_train_step(st, mesh)
        for _ in range(2):
            sh, m_sh = gfn(sh, data["gts"][0], jnp.int32(0), data["proj"])

        np.testing.assert_allclose(float(m_sh.loss), float(m_ref.loss),
                                   rtol=1e-4)
        # state stays on the shard across steps
        assert sh.params.xyz.sharding.spec == (gauss_shard.GAUSS_AXIS,)
        for a, b in zip(jax.tree.leaves(ref.params),
                        jax.tree.leaves(sh.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)
        for a, b in zip(jax.tree.leaves(ref.motion),
                        jax.tree.leaves(sh.motion)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)

    def test_gauss_sharded_render_matches(self, setup):
        data, params, aux, mcfg, motion_params = setup
        mesh = gauss_shard.make_gauss_mesh(8)
        rin = gm.render_inputs(params, data["gcfg"])
        cams = motion_lib.subframe_cameras(
            motion_params, jnp.int32(0), jnp.zeros((1,)), data["proj"], mcfg)
        cam = jax.tree.map(lambda l: l[0], cams)
        bg = jnp.zeros(3)

        def call(r):
            out = r(rin["means3d"], rin["scales"], rin["rotations"],
                    rin["opacities"], rin["shs"], cam, data["cs"], bg,
                    cfg=data["rcfg"], sh_degree=1, active=aux.active)
            return out.image, out.depth

        img_ref, d_ref = jax.jit(lambda: call(render))()
        sharded = gauss_shard.gauss_sharded_render(render, mesh)
        img_sh, d_sh = jax.jit(lambda: call(sharded))()
        np.testing.assert_allclose(np.asarray(img_sh), np.asarray(img_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref),
                                   atol=1e-4)
