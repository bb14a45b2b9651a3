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


def top_ops(logdir, k=30):
    from xprof.convert import raw_to_tool_data as rtd

    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    data, _ = rtd.xspace_to_tool_data(paths, "op_profile", {})
    import json
    prof = json.loads(data)

    rows = []

    def walk(node, path):
        ch = node.get("children", [])
        m = node.get("metrics", {})
        if not ch and m:
            rows.append((m.get("rawTime", 0), node.get("name", "?")))
        for c in ch:
            walk(c, path + [node.get("name", "?")])

    walk(prof.get("byProgram", prof), [])
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"total device time {total/1e9:.3f} s over {len(rows)} ops")
    for t, name in rows[:k]:
        print(f"{t/1e6:9.3f} ms  {100*t/max(total,1):5.1f}%  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--logdir", default="/tmp/xprof_trace")
    args = ap.parse_args()

    from bench import build_scene
    from deblurgs_tpu.ops.rasterize import RasterizeConfig, render

    gauss, cam, cs = build_scene(n=args.n, width=args.width, height=args.height)
    bg = jnp.zeros(3)
    probe_cfg = RasterizeConfig(backend="xla", max_pairs=1 << 20, k_max=8,
                                tile_w=args.tile, tile_h=args.tile)
    probe = jax.jit(lambda *a: render(*a, cam, cs, bg, cfg=probe_cfg,
                                      sh_degree=2).num_pairs)
    num_pairs = int(probe(*gauss))
    max_pairs = max(int(num_pairs * 1.1) + 1023 & ~1023, 1 << 14)
    cfg = RasterizeConfig(backend="pallas", max_pairs=max_pairs, k_max=2048,
                          tile_w=args.tile, tile_h=args.tile,
                          need_n_contrib=False)

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

    top_ops(args.logdir)


if __name__ == "__main__":
    main()
