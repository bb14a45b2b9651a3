"""Stage-split profiler for the fused rasterizer at bench scale (1080p/100k).

Ablates the pipeline cumulatively so each stage's marginal cost is the
difference between consecutive rows. Pipelined timing (one device sync per
batch of iters, distinct inputs per call — the remote tunnel value-caches
identical dispatches). Updates the stage table in BASELINE.md by hand.

Usage: python scripts/profile_stages.py [--n 100000 --width 1920 --height 1080]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import build_scene
from deblurgs_tpu.core.transforms import build_covariance
from deblurgs_tpu.ops import binning as binning_lib
from deblurgs_tpu.ops import pallas_blend
from deblurgs_tpu.ops import preprocess as pre_lib
from deblurgs_tpu.ops.rasterize import RasterizeConfig, render


def timeit(fn, variants, iters):
    out = fn(*variants[0])
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(iters):
        out = fn(*variants[i % len(variants)])
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--window", type=int, default=1,
                    help="tiles per pallas grid step (e.g. --tile 16 "
                         "--window 4 = the fine-tile windowed kernel)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--layout", type=str, default="mixed",
                    choices=["lockstep", "mixed"])
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    backend = "pallas" if platform != "cpu" else "xla"
    gauss, cam, cs = build_scene(n=args.n, width=args.width, height=args.height)
    bg = jnp.zeros(3)

    probe_cfg = RasterizeConfig(backend="xla", max_pairs=1 << 20, k_max=8,
                                tile_w=args.tile, tile_h=args.tile)
    probe = jax.jit(lambda *a: render(*a, cam, cs, bg, cfg=probe_cfg,
                                      sh_degree=2).num_pairs)
    num_pairs = int(probe(*gauss))
    max_pairs = max(int(num_pairs * 1.1) + 1023 & ~1023, 1 << 14)
    print(f"num_pairs={num_pairs} max_pairs={max_pairs}", flush=True)
    cfg = RasterizeConfig(backend=backend, max_pairs=max_pairs, k_max=2048,
                          tile_w=args.tile, tile_h=args.tile,
                          need_n_contrib=False, window=args.window,
                          layout=args.layout)
    bcfg = cfg.blend_config(cs)

    def _pre(g):
        cov6 = build_covariance(g[1], g[2], 1.0)
        return pre_lib.preprocess(g[0], cov6, g[4], None, g[3], cam, cs,
                                  sh_degree=2, tile_w=args.tile,
                                  tile_h=args.tile)

    def stage_pre(*g):
        return jax.tree.map(lambda x: x.sum(), _pre(g))

    def stage_expand(*g):
        pre = _pre(g)
        out = binning_lib.expand_compact(
            pre.tiles_touched.astype(jnp.int32), max_pairs)
        return jax.tree.map(lambda x: x.sum(), out)

    def stage_prepare(*g):
        # expand + compact-table + broadcast kernel + sort + step maps
        pre = _pre(g)
        prep, total, mpt = pallas_blend.prepare_fused(
            bcfg, pre.means2d, pre.conic, pre.opacity, pre.color, pre.depth,
            pre.rect, pre.tiles_touched.astype(jnp.int32), max_pairs)
        leaves = ((prep.fields, prep.pair_gauss, total, mpt)
                  + ((prep.step_tile,) if hasattr(prep, "step_tile")
                     else (prep.smap,)))
        return jax.tree.map(lambda x: x.sum(), leaves)

    def stage_full(*g):
        return render(*g, cam, cs, bg, cfg=cfg, sh_degree=2).image

    def stage_fwdbwd(*g):
        def loss(means):
            out = render(means, *g[1:], cam, cs, bg, cfg=cfg, sh_degree=2)
            return out.image.sum() + out.depth.sum()
        return jax.grad(loss)(g[0])

    def stage_floor(*g):
        return g[0].sum()

    means = gauss[0]
    variants = [(means + i * 1e-5,) + gauss[1:] for i in range(args.iters)]
    jax.block_until_ready(variants)

    rows = [
        ("dispatch floor", stage_floor),
        ("preprocess", stage_pre),
        ("+expand", stage_expand),
        ("+bcast+sort+maps", stage_prepare),
        ("full fwd", stage_full),
        ("fwd+bwd", stage_fwdbwd),
    ]
    prev = 0.0
    for name, fn in rows:
        dt = timeit(jax.jit(fn), variants, args.iters)
        print(f"{name:17s} {dt * 1e3:8.2f} ms   "
              f"(marginal {max(dt - prev, 0) * 1e3:7.2f} ms)", flush=True)
        if name != "full fwd":
            prev = dt


if __name__ == "__main__":
    main()
