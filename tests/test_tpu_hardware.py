"""Opt-in real-hardware parity tests.

The main suite runs hermetically on CPU (Pallas via interpret mode). These
run the compiled Mosaic kernels on an actual accelerator:

    RUN_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q

(conftest's CPU pinning is bypassed via a subprocess so the accelerator
plugin initializes normally.)
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_TPU_TESTS"),
    reason="set RUN_TPU_TESTS=1 to run real-hardware tests",
)

_SCRIPT = textwrap.dedent("""
    import json
    import jax, jax.numpy as jnp, numpy as np
    import sys
    sys.path.insert(0, "tests")
    from scene_factory import make_camera, make_gaussians
    from deblurgs_tpu.ops.rasterize import RasterizeConfig, render

    assert jax.devices()[0].platform != "cpu", jax.devices()
    cam, cs, _ = make_camera(width=160, height=120)
    means, scales, rots, opac, shs = make_gaussians(
        jax.random.PRNGKey(0), n=2000, sh_deg=2, scale_rng=(0.01, 0.05))
    bg = jnp.array([0.1, 0.2, 0.3])
    outs = {}
    # the oracle does NOT share the binning/sort path with the tile
    # backends — comparing against it on-device catches hardware-specific
    # index corruption the pallas-vs-xla comparison is blind to (e.g. the
    # int->f32 bitcast denormal flush that zeroed tile rects on real TPUs
    # while both tile backends agreed with each other)
    for backend in ("pallas", "xla", "oracle"):
        cfg = RasterizeConfig(backend=backend, max_pairs=1 << 15, k_max=2048)
        f = jax.jit(lambda m: render(m, scales, rots, opac, shs, cam, cs,
                                     bg, cfg=cfg, sh_degree=2).image)
        outs[backend] = np.asarray(f(means))
    # windowed fine-tile kernel (own binning layout → own oracle check)
    cfgw = RasterizeConfig(backend="pallas", max_pairs=1 << 16, k_max=2048,
                           tile_w=16, tile_h=16, window=4)
    fw = jax.jit(lambda m: render(m, scales, rots, opac, shs, cam, cs,
                                  bg, cfg=cfgw, sh_degree=2).image)
    cfgx16 = RasterizeConfig(backend="xla", max_pairs=1 << 16, k_max=2048,
                             tile_w=16, tile_h=16)
    fx16 = jax.jit(lambda m: render(m, scales, rots, opac, shs, cam, cs,
                                    bg, cfg=cfgx16, sh_degree=2).image)
    outs["pallas_w4"] = np.asarray(fw(means))
    outs["xla16"] = np.asarray(fx16(means))
    # windowed backward on-device (owner select-sum across sub-tile operand
    # streams is window-specific logic the forward never exercises)
    gw = np.asarray(jax.jit(jax.grad(lambda m: fw(m).sum()))(means))
    gx = np.asarray(jax.jit(jax.grad(lambda m: fx16(m).sum()))(means))
    gscale = float(np.abs(gx).max()) or 1.0
    diff_w4_grad = float(np.abs(gw - gx).max()) / gscale
    # mixed single-pass chunk layout + tile cull + tight rects (the bench
    # configuration) — forward AND backward vs the 16px XLA reference
    cfgm = RasterizeConfig(backend="pallas", max_pairs=1 << 16, k_max=2048,
                           tile_w=16, tile_h=16, window=4, layout="mixed",
                           need_n_contrib=False)
    fm = jax.jit(lambda m: render(m, scales, rots, opac, shs, cam, cs,
                                  bg, cfg=cfgm, sh_degree=2).image)
    outs["pallas_mixed"] = np.asarray(fm(means))
    gm = np.asarray(jax.jit(jax.grad(lambda m: fm(m).sum()))(means))
    cfg = RasterizeConfig(backend="xla", max_pairs=1 << 15, k_max=2048)
    out = render(means, scales, rots, opac, shs, cam, cs, bg, cfg=cfg,
                 sh_degree=2)
    assert int(out.max_per_tile) <= 2048, int(out.max_per_tile)
    diff = float(np.abs(outs["pallas"] - outs["xla"]).max())
    diff_oracle = float(np.abs(outs["pallas"] - outs["oracle"]).max())
    diff_w4 = float(np.abs(outs["pallas_w4"] - outs["xla16"]).max())
    diff_mixed = float(np.abs(outs["pallas_mixed"] - outs["xla16"]).max())
    gscale = float(np.abs(gx).max()) or 1.0
    diff_mixed_grad = float(np.abs(gm - gx).max()) / gscale
    print(json.dumps({"max_image_diff": diff,
                      "max_vs_oracle_diff": diff_oracle,
                      "max_w4_diff": diff_w4,
                      "max_w4_grad_diff": diff_w4_grad,
                      "max_mixed_diff": diff_mixed,
                      "max_mixed_grad_diff": diff_mixed_grad}))
    assert diff < 1e-3, diff
    assert diff_oracle < 1e-3, diff_oracle
    assert diff_w4 < 1e-3, diff_w4
    assert diff_w4_grad < 1e-3, diff_w4_grad
    assert diff_mixed < 1e-3, diff_mixed
    assert diff_mixed_grad < 1e-3, diff_mixed_grad
""")


def test_pallas_matches_xla_on_device():
    res = subprocess.run(
        [sys.executable, "-u", "-c", _SCRIPT], capture_output=True, text=True,
        timeout=1100, cwd=os.path.dirname(os.path.dirname(__file__)),
        env=dict(os.environ),
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    assert json.loads(line)["max_image_diff"] < 1e-3
