"""Benchmark: sub-frame renders/s/chip at 1080p (BASELINE.md headline metric).

Renders a fixed-seed synthetic scene (100k Gaussians, 1920x1080, SH degree
2) with the Pallas tile rasterizer on the available accelerator and reports
forward sub-frame renders per second. ``vs_baseline`` normalizes against a
nominal 100 renders/s for the reference CUDA rasterizer on A100 at a
comparable scene scale (the reference repo publishes no numbers —
BASELINE.md; target is >= 2.0 on v5p).

Prints ONE JSON line with the headline metric plus training-relevant
extras (the training north star is the full step, not forward):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "fwdbwd_renders_per_s": N,   # fwd+bwd through the rasterizer custom_vjp
   "train_step_per_s": N,       # full jitted train step (f sub-frame
                                #  renders + loss + bwd + Adam), steps/s
   "train_renders_per_s": N,    # = train_step_per_s * f
   "parity_ok": bool|null}      # on-device pallas-vs-xla forward parity
                                #  (the round-1 denormal bug class)
"""

import json
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_BASELINE_RENDERS_PER_S = 100.0


def build_scene(n=100_000, width=1920, height=1080):
    from deblurgs_tpu.core import camera as cam_lib
    from deblurgs_tpu.core import lie

    fovx = 1.2
    fovy = 2 * math.atan(math.tan(fovx / 2) * height / width)
    cs = cam_lib.CameraStatic(width=width, height=height,
                              tanfovx=math.tan(fovx / 2),
                              tanfovy=math.tan(fovy / 2))
    proj = cam_lib.get_projection_matrix(0.01, 100.0, fovx, fovy)
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    means = jax.random.normal(ks[0], (n, 3)) * 2.0
    scales = jnp.exp(jax.random.uniform(ks[1], (n, 3), minval=math.log(0.004),
                                        maxval=math.log(0.04)))
    q = jax.random.normal(ks[2], (n, 4))
    rots = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    opac = jax.random.uniform(ks[3], (n,), minval=0.1, maxval=0.95)
    shs = jax.random.normal(ks[4], (n, 9, 3)) * 0.3
    rot = lie.so3_exp_map(jnp.zeros((1, 3)))[0]
    center = jnp.array([0.0, 0.0, -6.0])
    cam = cam_lib.make_camera_arrays(cam_lib.c2w_to_view(rot, center), proj)
    return (means, scales, rots, opac, shs), cam, cs


def _timeit(fn, variants, iters):
    out = fn(*variants[0])
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(iters):
        out = fn(*variants[i % len(variants)])
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def _parity_check(backend):
    """Small-scene on-device forward parity: pallas vs xla vs oracle.

    The class of bug this catches (round 1: an int32→f32 bitcast whose
    values are denormals that real TPUs flush to zero) is invisible to CPU
    tests — so every bench capture re-checks it on the live device."""
    from deblurgs_tpu.ops.rasterize import RasterizeConfig, render

    gauss, cam, cs = build_scene(n=4_000, width=512, height=384)
    bg = jnp.full((3,), 0.25)
    imgs = {}
    for be in (backend, "xla", "oracle"):
        cfg = RasterizeConfig(backend=be, max_pairs=1 << 16, k_max=512,
                              tile_w=16, tile_h=16,
                              layout="mixed" if be == "pallas" else
                              "lockstep", need_n_contrib=be != "pallas")
        fn = jax.jit(lambda *a, _c=cfg: render(*a, cam, cs, bg, cfg=_c,
                                               sh_degree=2).image)
        imgs[be] = np.asarray(fn(*gauss))
    err_x = float(np.abs(imgs[backend] - imgs["xla"]).max())
    err_o = float(np.abs(imgs[backend] - imgs["oracle"]).max())
    return bool(err_x < 5e-3 and err_o < 5e-3), err_x, err_o


def _train_step_bench(backend, n, width, height, max_pairs, tile, n_sub,
                      iters):
    """Full jitted DeblurGS train step (f sub-frame renders -> blur ->
    loss -> bwd through rasterizer+curves -> Adam), steps/s."""
    from deblurgs_tpu.core import camera as cam_lib
    from deblurgs_tpu.core import lie
    from deblurgs_tpu.models import gaussians as gm
    from deblurgs_tpu.models import motion as motion_lib
    from deblurgs_tpu.ops.rasterize import RasterizeConfig
    from deblurgs_tpu.train import step as step_lib
    from deblurgs_tpu.train.config import OptimizationConfig

    fovx = 1.2
    fovy = 2 * math.atan(math.tan(fovx / 2) * height / width)
    cs = cam_lib.CameraStatic(width=width, height=height,
                              tanfovx=math.tan(fovx / 2),
                              tanfovy=math.tan(fovy / 2))
    proj = cam_lib.get_projection_matrix(0.01, 100.0, fovx, fovy)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    pts = jax.random.normal(ks[0], (n, 3)) * 2.0
    cols = jax.random.uniform(ks[1], (n, 3))
    gcfg = gm.GaussianConfig(sh_degree=2)
    params, aux = gm.create_from_pcd(pts, cols, gcfg, capacity=n)
    mcfg = motion_lib.MotionConfig(curve_order=9, n_subframes=n_sub)
    rot = lie.so3_exp_map(jnp.zeros((1, 3)))
    center = jnp.array([[0.0, 0.0, -6.0]])
    motion = motion_lib.init_motion(rot, center, mcfg, ks[2])
    ocfg = OptimizationConfig(iterations=10_000, curve_start_iter=1,
                              densify_from_iter=10**9,
                              opacity_reset_interval=10**9)
    rcfg = RasterizeConfig(backend=backend, max_pairs=max_pairs, k_max=2048,
                           tile_w=tile, tile_h=tile, need_n_contrib=False,
                           layout="mixed" if backend == "pallas" else
                           "lockstep",
                           window=2 if backend == "pallas" else 1)
    st = step_lib.TrainStatics(gcfg=gcfg, mcfg=mcfg, ocfg=ocfg, rcfg=rcfg,
                               cs=cs, sh_degree=2, n_sub=n_sub,
                               tone_mapping="identity")
    fn = step_lib.make_train_step(st)
    state = step_lib.init_state(params, motion, aux, ks[3])
    state = state._replace(step=jnp.full((), 100, jnp.int32))
    gt = jax.random.uniform(ks[3], (height, width, 3))

    def one(state, gt):
        new_state, m = fn(state, gt, jnp.zeros((), jnp.int32), proj)
        return new_state, m.loss

    # TWO warmup calls: the second runs on the post-step state, so if any
    # leaf still changes signature across the step (the round-3 bench bug:
    # weak-int32 overflow_count recompiling inside the timed window) the
    # recompile is paid here, not in the timing loop
    state, _ = jax.block_until_ready(one(state, gt))
    state, _ = jax.block_until_ready(one(state, gt))
    t0 = time.time()
    for _ in range(iters):
        state, loss = one(state, gt)
    jax.block_until_ready(loss)
    return (time.time() - t0) / iters


def main():
    platform = jax.devices()[0].platform
    backend = "pallas" if platform != "cpu" else "xla"
    n = 100_000 if platform != "cpu" else 2_000
    width, height = (1920, 1080) if platform != "cpu" else (320, 180)

    from deblurgs_tpu.ops.rasterize import RasterizeConfig, render

    gauss, cam, cs = build_scene(n=n, width=width, height=height)
    bg = jnp.zeros(3)

    # two-pass pair-capacity sizing (the training loop resizes the same way)
    tile = 32 if platform != "cpu" else 16
    probe_cfg = RasterizeConfig(backend="xla", max_pairs=1 << 20, k_max=8,
                                tile_w=tile, tile_h=tile)
    probe = jax.jit(lambda *a: render(*a, cam, cs, bg, cfg=probe_cfg,
                                      sh_degree=2).num_pairs)
    num_pairs = int(probe(*gauss))
    max_pairs = max(int(num_pairs * 1.1) + 1023 & ~1023, 1 << 14)
    # mixed/window-2 is the round-5 measured optimum for BOTH fwd (16.0 ms
    # vs 17.8 at w1) and fwd+bwd (37.2 ms) — the one-contraction output
    # routing made the wider block free while halving window-advance
    # revisit steps (runs/r5_ab2.log); the train-step bench below uses the
    # same window
    cfg = RasterizeConfig(backend=backend, max_pairs=max_pairs, k_max=2048,
                          tile_w=tile, tile_h=tile, need_n_contrib=False,
                          window=2 if backend == "pallas" else 1,
                          layout="mixed" if backend == "pallas" else
                          "lockstep")

    fn = jax.jit(lambda *a: render(*a, cam, cs, bg, cfg=cfg, sh_degree=2).image)

    # distinct inputs per call (the remote-execution layer value-caches
    # repeated identical dispatches, which would fake the timing)
    means = gauss[0]
    iters = 30 if platform != "cpu" else 3
    variants = [(means + i * 1e-5,) + gauss[1:] for i in range(iters)]
    jax.block_until_ready(variants)
    renders_per_s = 1.0 / _timeit(fn, variants, iters)

    result = {
        "metric": f"subframe_renders_per_s_{width}x{height}_{n // 1000}k",
        "value": round(renders_per_s, 2),
        "unit": "renders/s/chip",
        "vs_baseline": round(renders_per_s / A100_BASELINE_RENDERS_PER_S, 3),
        "fwdbwd_renders_per_s": None,
        "train_step_per_s": None,
        "train_renders_per_s": None,
        "train_n_sub": None,
        "parity_ok": None,
    }

    # opt-in fast blend mode (bounded ~1e-3-order error, --fast in the
    # train CLI): reported as an extra, never the headline
    if backend == "pallas":
        try:
            import dataclasses as _dc
            fcfg = _dc.replace(cfg, fast=True)
            ffn = jax.jit(lambda *a: render(*a, cam, cs, bg, cfg=fcfg,
                                            sh_degree=2).image)
            result["fast_renders_per_s"] = round(
                1.0 / _timeit(ffn, variants, iters), 2)
        except Exception as e:  # noqa: BLE001
            print(f"fast-mode bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # forward+backward through the rasterizer custom_vjp (training kernels)
    try:
        def fwdbwd(*g):
            def loss(means):
                out = render(means, *g[1:], cam, cs, bg, cfg=cfg, sh_degree=2)
                return out.image.sum() + 0.1 * out.depth.sum()
            return jax.grad(loss)(g[0])

        bwd_iters = max(iters // 2, 2)
        result["fwdbwd_renders_per_s"] = round(
            1.0 / _timeit(jax.jit(fwdbwd), variants, bwd_iters), 2)
    except Exception as e:  # noqa: BLE001
        print(f"fwd+bwd bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # full train step at the blur operating point (f sub-frames per step)
    try:
        n_sub = 21 if platform != "cpu" else 3
        step_iters = 10 if platform != "cpu" else 2
        dt_step = _train_step_bench(backend, n, width, height,
                                    cfg.max_pairs, tile, n_sub, step_iters)
        result["train_step_per_s"] = round(1.0 / dt_step, 3)
        result["train_renders_per_s"] = round(n_sub / dt_step, 2)
        result["train_n_sub"] = n_sub
        # sanity cross-check: a train-step render can cost at most ~4x a
        # bare fwd+bwd render (the residual is loss + Adam + densify
        # bookkeeping). A larger gap means the bench mis-measured (e.g. a
        # recompile inside the timed window — the round-3 50x artifact).
        fb = result["fwdbwd_renders_per_s"]
        if fb:
            ratio = fb / max(result["train_renders_per_s"], 1e-9)
            result["train_bench_sane"] = bool(ratio < 4.0)
            if ratio >= 4.0:
                print(f"train-step bench INSANE: fwd+bwd renders/s is "
                      f"{ratio:.1f}x train renders/s (expected < 4x) — "
                      "likely a recompile in the timed window",
                      file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"train-step bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # on-device backend parity gate (see _parity_check docstring)
    try:
        ok, err_x, err_o = _parity_check(backend)
        result["parity_ok"] = ok
        result["parity_max_err"] = {"vs_xla": round(err_x, 6),
                                    "vs_oracle": round(err_o, 6)}
    except Exception as e:  # noqa: BLE001
        print(f"parity check failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
