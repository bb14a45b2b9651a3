"""Real 2-process ``jax.distributed`` exercise (VERDICT round-1 item 4).

``tests/test_sharding.py`` proves sharded == single-device numerics on a
virtual in-process mesh; this test runs the actual multi-process path that
a pod deployment uses: ``multihost.initialize`` (coordinator handshake),
``global_mesh`` spanning both processes, ``host_local_camera_split`` +
``assemble_global_images`` (each process decodes only its camera shard),
``select_camera`` (owning-shard broadcast as an XLA collective), and one
sharded train step whose sub-frame axis spans the process boundary.

Two subprocesses × 2 virtual CPU devices each → a 4-device global mesh.
Both processes print their loss; they must agree with each other AND with
a single-process reference run of the identical step.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent("""
    import json, os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.pop("JAX_PLATFORMS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.getcwd())

    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); coord = sys.argv[3]
    single = sys.argv[4] == "single"

    from deblurgs_tpu.parallel import multihost
    if not single:
        multihost.initialize(coordinator_address=coord,
                             num_processes=nproc, process_id=pid)
        assert jax.process_count() == nproc, jax.process_count()
        assert len(jax.devices()) == 2 * nproc, jax.devices()

    import jax.numpy as jnp
    import numpy as np
    from tests.test_train import build_synthetic
    from deblurgs_tpu.models import gaussians as gm
    from deblurgs_tpu.models import motion as motion_lib
    from deblurgs_tpu.train import step as step_lib
    from deblurgs_tpu.train.config import OptimizationConfig

    data = build_synthetic(jax.random.PRNGKey(0), n_cams=4)
    gcfg, rcfg = data["gcfg"], data["rcfg"]
    params, aux = gm.create_from_pcd(data["pts"], data["cols"], gcfg,
                                     capacity=64)
    n_dev = len(jax.devices())
    mcfg = motion_lib.MotionConfig(curve_order=3, n_subframes=n_dev)
    motion = motion_lib.init_motion(data["rots"], data["centers"], mcfg,
                                    jax.random.PRNGKey(1), init_noise=0.01)
    ocfg = OptimizationConfig(curve_start_iter=1, densify_from_iter=10**9,
                              opacity_reset_interval=10**9)
    mesh = multihost.global_mesh() if not single else None
    st = step_lib.TrainStatics(
        gcfg=gcfg, mcfg=mcfg, ocfg=ocfg, rcfg=rcfg, cs=data["cs"],
        sh_degree=1, n_sub=n_dev, tone_mapping="identity", mesh=mesh)
    state = step_lib.init_state(params, motion, aux, jax.random.PRNGKey(2))
    fn = step_lib.make_train_step(st)

    # per-host camera shard -> global camera-sharded stack -> collective
    # broadcast of the sampled camera
    gts_np = np.asarray(data["gts"])
    if not single:
        mine = multihost.host_local_camera_split(gts_np.shape[0])
        masked = np.zeros_like(gts_np)
        masked[mine] = gts_np[mine]
        gts = multihost.assemble_global_images(masked)
    else:
        gts = jnp.asarray(gts_np)

    losses = []
    for it in range(2):
        gt = multihost.select_camera(gts, jnp.int32(it)) if not single \\
            else gts[it]
        state, metrics = fn(state, gt, jnp.int32(it), data["proj"])
        losses.append(float(metrics.loss))
    print("RESULT " + json.dumps({"pid": pid, "losses": losses}), flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_step(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    def spawn(pid, nproc, mode):
        return subprocess.Popen(
            [sys.executable, "-u", "-c", _WORKER, str(pid), str(nproc),
             coord, mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=root, env=env,
        )

    # single-process reference (4 local devices = same mesh size)
    ref_env = dict(env)
    ref = subprocess.run(
        [sys.executable, "-u", "-c",
         _WORKER.replace('device_count=2', 'device_count=4'),
         "0", "1", coord, "single"],
        capture_output=True, text=True, cwd=root, env=ref_env, timeout=900)
    assert ref.returncode == 0, ref.stdout[-3000:] + ref.stderr[-2000:]
    ref_losses = json.loads(
        [l for l in ref.stdout.splitlines() if l.startswith("RESULT")][0]
        .split(" ", 1)[1])["losses"]

    procs = [spawn(0, 2, "multi"), spawn(1, 2, "multi")]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        r = json.loads(line.split(" ", 1)[1])
        results[r["pid"]] = r["losses"]
    assert set(results) == {0, 1}
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)
    np.testing.assert_allclose(results[0], ref_losses, rtol=5e-4)
