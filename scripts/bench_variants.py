"""Quick (tile, window) sweep of end-to-end forward (and fwd+bwd) wall time
at bench scale — one process, pipelined timing, distinct inputs per call
(the remote tunnel value-caches identical dispatches).

Usage: python scripts/bench_variants.py [--variants 32x1,16x4,16x2]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import build_scene
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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--variants", type=str, default="32x1,m16x4,m32x2",
                    help="comma list of [m]TILExWINDOW or "
                         "[m]TWxTHxWINDOW for rectangular tiles "
                         "(m = mixed layout); an optional cN suffix sets "
                         "the mixed chunk width, e.g. m32x2c256")
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--no_cull", action="store_true")
    ap.add_argument("--fat_rect", action="store_true",
                    help="disable tight emission rects")
    ap.add_argument("--fast", action="store_true",
                    help="fast blend mode (mixed layout only: no per-lane "
                         "T-freeze gates, bounded ~1e-3-order error)")
    args = ap.parse_args()

    gauss, cam, cs = build_scene(n=args.n, width=args.width,
                                 height=args.height)
    bg = jnp.zeros(3)
    inputs = [(gauss[0] + i * 1e-5,) + gauss[1:] for i in range(args.iters)]
    jax.block_until_ready(inputs)

    pair_cache = {}
    tight = not args.fat_rect
    for spec in args.variants.split(","):
        layout = "lockstep"
        if spec.startswith("m"):
            layout, spec = "mixed", spec[1:]
        chunk = 0
        if "c" in spec:
            spec, ck = spec.split("c")
            chunk = int(ck)
        parts = [int(v) for v in spec.split("x")]
        if len(parts) == 2:
            tw = th = parts[0]
            window = parts[1]
        else:
            tw, th, window = parts
        if (tw, th) not in pair_cache:
            probe_cfg = RasterizeConfig(backend="xla", max_pairs=1 << 20,
                                        k_max=8, tile_w=tw, tile_h=th,
                                        tight_rect=tight)
            probe = jax.jit(lambda *a: render(
                *a, cam, cs, bg, cfg=probe_cfg, sh_degree=2).num_pairs)
            pair_cache[(tw, th)] = int(probe(*gauss))
        num_pairs = pair_cache[(tw, th)]
        max_pairs = max(int(num_pairs * 1.1) + 1023 & ~1023, 1 << 14)
        cfg = RasterizeConfig(backend="pallas", max_pairs=max_pairs,
                              k_max=2048, tile_w=tw, tile_h=th,
                              need_n_contrib=False, window=window,
                              layout=layout, tile_cull=not args.no_cull,
                              tight_rect=tight, chunk=chunk,
                              fast=args.fast and layout == "mixed")

        fwd = jax.jit(lambda *a: render(*a, cam, cs, bg, cfg=cfg,
                                        sh_degree=2).image)
        dt = timeit(fwd, inputs, args.iters)
        line = (f"{layout[:4]} tile{tw}x{th} w{window}: pairs={num_pairs} "
                f"fwd {dt * 1e3:7.2f} ms ({1.0 / dt:6.1f}/s)")
        if args.bwd:
            def step(*g, _cfg=cfg):
                def loss(means):
                    out = render(means, *g[1:], cam, cs, bg, cfg=_cfg,
                                 sh_degree=2)
                    return out.image.sum() + out.depth.sum()
                return jax.grad(loss)(g[0])
            dtb = timeit(jax.jit(step), inputs, args.iters)
            line += f"  fwd+bwd {dtb * 1e3:7.2f} ms ({1.0 / dtb:6.1f}/s)"
        print(line, flush=True)


if __name__ == "__main__":
    main()
