"""Capture a jax.profiler trace of the bench-scale forward (+backward) and
print the top device ops by self time (parsed from the xplane protobuf via
the xprof/tensorboard-plugin-profile package)."""
import argparse
import glob
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def top_ops(logdir, k=20, iters=10):
    import json

    from xprof.convert import raw_to_tool_data as rtd

    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    data, _ = rtd.xspace_to_tool_data(paths, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = []
    for r in json.loads(data)[0]["rows"]:
        c = [x.get("v") for x in r["c"]]
        if c[1] != "Device" or not c[4]:
            continue
        rows.append((c[5], c[4], c[3]))  # total us, occurrences, name
    rows.sort(reverse=True)
    total = sum(a for a, _, _ in rows)
    print(f"device total per iter: {total / iters / 1e3:.2f} ms")
    for tot, occ, name in rows[:k]:
        print(f"{tot / iters:9.1f} us/iter x{int(occ):4d}  {name[:90]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--window", type=int, default=1)
    ap.add_argument("--layout", default="lockstep",
                    choices=["lockstep", "mixed"])
    ap.add_argument("--no_cull", action="store_true")
    ap.add_argument("--fat_rect", action="store_true")
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--logdir", default="/tmp/xprof_trace")
    args = ap.parse_args()

    from bench import build_scene
    from deblurgs_tpu.ops.rasterize import RasterizeConfig, render

    gauss, cam, cs = build_scene(n=args.n, width=args.width, height=args.height)
    bg = jnp.zeros(3)
    probe_cfg = RasterizeConfig(backend="xla", max_pairs=1 << 20, k_max=8,
                                tile_w=args.tile, tile_h=args.tile,
                                tight_rect=not args.fat_rect)
    probe = jax.jit(lambda *a: render(*a, cam, cs, bg, cfg=probe_cfg,
                                      sh_degree=2).num_pairs)
    num_pairs = int(probe(*gauss))
    max_pairs = max(int(num_pairs * 1.1) + 1023 & ~1023, 1 << 14)
    print(f"pairs={num_pairs} max_pairs={max_pairs}")
    cfg = RasterizeConfig(backend="pallas", max_pairs=max_pairs, k_max=2048,
                          tile_w=args.tile, tile_h=args.tile,
                          need_n_contrib=False, window=args.window,
                          layout=args.layout, tile_cull=not args.no_cull,
                          tight_rect=not args.fat_rect)

    if args.bwd:
        def step(*g):
            def loss(means):
                out = render(means, *g[1:], cam, cs, bg, cfg=cfg, sh_degree=2)
                return out.image.sum() + out.depth.sum()
            return jax.grad(loss)(g[0])
    else:
        def step(*g):
            return render(*g, cam, cs, bg, cfg=cfg, sh_degree=2).image

    fn = jax.jit(step)
    variants = [(gauss[0] + i * 1e-5,) + gauss[1:] for i in range(args.iters)]
    jax.block_until_ready(fn(*variants[0]))

    with jax.profiler.trace(args.logdir):
        for i in range(args.iters):
            out = fn(*variants[i])
        jax.block_until_ready(out)

    top_ops(args.logdir, iters=args.iters)


if __name__ == "__main__":
    main()
